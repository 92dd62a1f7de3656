"""CLIP BPE tokenizer parity vs transformers, using a small synthetic
vocab/merges pair written to disk (the real SD checkpoint ships the full
49408-entry versions in the same format)."""

import json
import os

import numpy as np
import pytest

from blobctrl_tpu.tokenizer import clip_bpe

transformers = pytest.importorskip("transformers")


@pytest.fixture(scope="module")
def tok_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("tok")
    base = list(clip_bpe.bytes_to_unicode().values())
    vocab = {}
    for ch in base:
        vocab[ch] = len(vocab)
    for ch in base:
        vocab[ch + "</w>"] = len(vocab)
    merges = [("h", "e"), ("l", "l"), ("he", "ll"), ("o</w>", "!"),
              ("hell", "o</w>"), ("w", "o"), ("r", "l"), ("wo", "rl"),
              ("worl", "d</w>"), ("1", "2</w>")]
    for a, b in merges:
        tok = a + b
        if tok not in vocab:
            vocab[tok] = len(vocab)
    vocab["<|startoftext|>"] = len(vocab)
    vocab["<|endoftext|>"] = len(vocab)
    with open(d / "vocab.json", "w") as f:
        json.dump(vocab, f)
    with open(d / "merges.txt", "w") as f:
        f.write("#version: 0.2\n")
        for a, b in merges:
            f.write(f"{a} {b}\n")
    return str(d)


@pytest.mark.parametrize("text", [
    "hello world", "Hello,   WORLD!", "hello hello hello", "12 12",
    "a photo of a hello", "it's hello's world", "", "héllo wörld",
])
def test_tokenizer_matches_transformers(tok_dir, text):
    ref = transformers.CLIPTokenizer(
        os.path.join(tok_dir, "vocab.json"), os.path.join(tok_dir, "merges.txt"))
    mine = clip_bpe.CLIPTokenizer.from_dir(tok_dir)
    ref_ids = ref([text], padding="max_length", max_length=77,
                  truncation=True, return_tensors="np")["input_ids"]
    got = mine([text])
    np.testing.assert_array_equal(got, ref_ids.astype(np.int32))
