"""Compiled-HLO gates on the denoise while-body (VERDICT r4 Next #3 levers
"loop-invariant width-concat hoisting" and "ring-buffer aliasing audit").

The pipeline hoists the loop-invariant conditioning concats at source level
(blobnet_pipeline.denoise: blob_cond_left / blob_cond_right_extras /
unet_cond_left are built once, outside lax.fori_loop). These tests pin the
property in the OPTIMIZED HLO, where XLA's LICM must keep them out of the
while-body: each per-step concat signature appears exactly ONCE — its
loop-invariant twin (same shape, different operands) appearing would mean
the conditioning half is being rebuilt every step. Byte caps guard against
silent regressions (a leaked invariant or a full-ring-buffer copy per step
shows up as a byte explosion).

Geometry: flagship.tiny_configs at 64² (h=w=8, 2w=16; BlobNet input
channels 4+1+16=21, UNet 5). The property is shape-independent; tiny keeps
the CPU compile CI-sized. Reference counterpart: the eager per-step tensor
rebuilds of /root/reference/blobctrl/pipelines/pipeline_blobnet.py:1031-1076.
"""

import pytest

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def inventory():
    from scripts.hlo_loop_audit import audit
    report, _ = audit(steps=8, scheduler="unipc", size=64)
    return report["inventory"]


def _count(inv, op, shape, dim):
    """Occurrences of `op` with this shape@dim, any dtype (the CPU backend
    lowers parts of the bf16 graph as f32)."""
    total = 0
    for key, ent in inv.get(op, {}).get("shapes", {}).items():
        dt_shape, _, d = key.partition("@")
        if dt_shape.endswith(f"[{shape}]") and d == str(dim):
            total += ent["count"]
    return total


def test_invariant_concats_stay_hoisted(inventory):
    # per-step signatures appear exactly once; the hoisted invariant twin
    # (blob_cond_left / unet_cond_left, same shape different operands)
    # reappearing in the body doubles the count
    assert _count(inventory, "concatenate", "1,8,16,21", 2) == 1, inventory[
        "concatenate"]["shapes"]  # blob_in width concat (per-step)
    assert _count(inventory, "concatenate", "1,8,8,21", 3) == 1  # blob_right
    assert _count(inventory, "concatenate", "2,8,8,5", 3) == 1   # unet_right
    assert _count(inventory, "concatenate", "2,8,16,5", 2) == 1  # unet_in
    assert _count(inventory, "concatenate", "2,8,8,4", 0) == 1   # CFG dup


def test_body_concat_bytes_capped(inventory):
    # measured 343 KB/step at tiny geometry (2026-08, jax 0.8.x CPU HLO);
    # alert at +40% — a leaked 21-channel invariant adds ~16 KB+, a
    # rebuilt-conditioning regression far more
    assert inventory["concatenate"]["bytes"] < 480_000, \
        inventory["concatenate"]["shapes"]


def test_body_copy_bytes_capped(inventory):
    # measured 331 KB/step (attention layout copies on the CPU backend);
    # a non-aliased scheduler ring buffer or latent-history copy per step
    # would blow past this
    assert inventory["copy"]["bytes"] < 520_000, inventory["copy"]["shapes"]


def test_injections_are_in_place_updates(inventory):
    # the 28-site right-half residual protocol lowers to dynamic-update-slice
    # (tiny geometry has 16+); their absence would mean full-width
    # materialization instead of in-place right-half adds
    assert inventory["dynamic-update-slice"]["count"] >= 10
