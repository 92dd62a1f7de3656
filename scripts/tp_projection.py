"""Analytic TP-latency projection for the v5e-4 target (BASELINE.md: 50-step
512^2 edit < 1.5 s). Multi-chip hardware is not reachable from this
environment, so this script computes — from the real model configs — the
per-step collective volume under the Megatron specs in parallel/mesh.py and
projects the 4-chip edit time from the MEASURED single-chip numbers
(PERF_NOTES.md: per-step 70.9 ms, fixed 190 ms).

Communication model (parallel/mesh.py:47-67):
  * transformer blocks: column-parallel to_q/k/v + ff.proj_in, row-parallel
    to_out + ff.proj_out -> 3 all-reduces per BasicTransformerBlock (attn1
    out, attn2 out, ff out), each of the block's full activation.
  * conv stacks: Megatron pairing over each resnet's conv1/conv2 (conv1
    output-channel-sharded, conv2 contracting the sharded input) -> 1
    all-reduce per resnet at its output activation. Stragglers (conv_in/out,
    up/down-samplers, shortcut 1x1s) are counted as 1 all-reduce each.
  * ring all-reduce wire cost per chip: 2 * (m-1)/m * bytes / ici_bw.

Run: python scripts/tp_projection.py
"""

import dataclasses

BYTES = 2            # bf16 activations
STEPS = 50
H, W = 64, 128       # 512^2 latent, double-width layout
PER_STEP_MS = 70.9   # measured, PERF_NOTES "Where one step goes"
FIXED_MS = 190.0     # measured fixed cost (VAE enc/dec, dispatch, fetch)
# v5e ICI: 1600 Gbit/s aggregate per chip (Google spec). A 2x2 slice runs
# two simultaneous bidirectional rings; conservative effective all-reduce
# bus bandwidth per chip:
ICI_GBPS = {"conservative (1 ring, 45 GB/s)": 45e9,
            "typical (2 rings, 90 GB/s)": 90e9}


@dataclasses.dataclass
class Net:
    name: str
    batch: int                      # CFG dedup: UNet 2, BlobNet 1
    channels = (320, 640, 1280, 1280)
    layers_per_block = 2
    down_attn = (True, True, True, False)
    up_attn = (False, True, True, True)


def collective_bytes(net: Net):
    """Per-step all-reduce payload bytes (pre-ring-factor) for one forward."""
    ch = net.channels
    n_levels = len(ch)
    act = lambda level, c: net.batch * (H >> level) * (W >> level) * c * BYTES

    ar_bytes = 0.0
    counts = {"transformer_AR": 0, "resnet_AR": 0, "other_conv_AR": 0}

    def add_transformer(level, c, n_blocks):
        # 3 ARs per block (attn1 out, attn2 out, ff out), each act-sized
        counts["transformer_AR"] += 3 * n_blocks
        return 3 * n_blocks * act(level, c)

    def add_resnets(level, c, n):
        counts["resnet_AR"] += n
        return n * act(level, c)

    # down path: per block, layers_per_block resnets (+1 attn each if attn),
    # downsampler conv between levels
    for i in range(n_levels):
        ar_bytes += add_resnets(i, ch[i], net.layers_per_block)
        if net.down_attn[i]:
            ar_bytes += add_transformer(i, ch[i], net.layers_per_block)
        if i < n_levels - 1:  # downsampler conv -> 1 AR at the lower level
            counts["other_conv_AR"] += 1
            ar_bytes += act(i + 1, ch[i])
    # mid: resnet + attn + resnet at the deepest level
    ar_bytes += add_resnets(n_levels - 1, ch[-1], 2)
    ar_bytes += add_transformer(n_levels - 1, ch[-1], 1)
    # up path: layers_per_block+1 resnets per block (+attn), upsampler conv
    for i in reversed(range(n_levels)):
        ar_bytes += add_resnets(i, ch[i], net.layers_per_block + 1)
        # up block j runs at level n_levels-1-j -> attn flag up_attn[n-1-i]
        if net.up_attn[n_levels - 1 - i]:
            ar_bytes += add_transformer(i, ch[i], net.layers_per_block + 1)
        if i > 0:  # upsampler conv at the higher (coarser->finer) level
            counts["other_conv_AR"] += 1
            ar_bytes += act(i - 1, ch[i])
    return ar_bytes, counts


def main():
    total = 0.0
    all_counts = {}
    for net in (Net("UNet (CFG batch 2)", batch=2),
                Net("BlobNet (batch 1)", batch=1)):
        b, counts = collective_bytes(net)
        total += b
        all_counts[net.name] = (b, counts)
        n_ar = sum(counts.values())
        print(f"{net.name}: {b / 1e6:.1f} MB/step over {n_ar} all-reduces "
              f"({counts})")
    print(f"TOTAL all-reduce payload: {total / 1e6:.1f} MB/step, "
          f"{total * STEPS / 1e9:.2f} GB per 50-step edit")

    for m in (2, 4):
        ring = 2 * (m - 1) / m
        wire = total * ring
        print(f"\n== model={m} ==")
        compute_ms = PER_STEP_MS / m
        for label, bw in ICI_GBPS.items():
            comm_ms = wire / bw * 1e3
            # no overlap (worst case) and 50% overlap (XLA typically hides
            # part of the collectives behind the next layer's compute)
            step_worst = compute_ms + comm_ms
            step_half = compute_ms + 0.5 * comm_ms
            for tag, step_ms in (("no overlap", step_worst),
                                 ("50% overlap", step_half)):
                edit_s = (STEPS * step_ms + FIXED_MS) / 1e3
                print(f"  ICI {label:<32} {tag:<12} step {step_ms:6.2f} ms "
                      f"-> edit {edit_s:.2f} s "
                      f"{'< 1.5 TARGET MET' if edit_s < 1.5 else '>= 1.5'}")
        print(f"  (compute {compute_ms:.1f} ms/step, wire "
              f"{wire / 1e6:.0f} MB/step at ring factor {ring:.2f}; fixed "
              f"{FIXED_MS:.0f} ms assumed unchanged — conservative: the VAE "
              f"convs also shard)")


if __name__ == "__main__":
    main()
