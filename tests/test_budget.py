"""AOT memory/collective budget tests (BASELINE config #4 at REAL scale).

The Gemma3-4B full-joint ``--fsdp`` recipe cannot be executed on this repo's single
chip (fp32 Adam state alone ~32 GB), so its memory story is proven the way production
capacity planning does it: compile the actual train step AOT for the 8-device
topology on abstract shapes and machine-check the per-device peak HBM against the
v5e's usable 15.75 GiB, plus audit the collective traffic the FSDP layout pays per
step. Reference recipe: /root/reference/Stage2/train_vqa_stage2.py:121-134,
Stage2/trainer.py:189-246.

The 4B compiles take ~13 min each under the real XLA:TPU AOT compiler (see
``BUDGET_4B.json`` for the recorded sweep: the b=4/chunk=128 default shape OOMs at
16.47G — caught by this tool, not extrapolation — and the shipped operating point
fits), so they are gated behind ``PT_RUN_4B_BUDGET=1``; CI runs the same pipeline at
tiny widths every time instead.
"""

import json
import os

import pytest

from projectiontrainer_tpu.parallel import budget

_RUN_4B = os.environ.get("PT_RUN_4B_BUDGET") == "1"


def test_budget_pipeline_tiny():
    """The full budget pipeline (abstract params -> FSDP shardings -> AOT compile ->
    memory analysis -> collective inventory) at small widths on the virtual mesh —
    the always-on guard that the tool itself works, on THE SAME config the
    ``projectiontrainer-budget --preset small-test`` CLI compiles (one shared
    definition; its widths sit above the FSDP 64 KiB min-size cutoff so the
    ZeRO-3 gather/reduce pattern actually appears in the HLO)."""
    out = budget.full_joint_budget(
        budget.small_test_vlm_cfg(), n_devices=8, batch_per_device=1, q_len=8,
        a_len=16, accum_steps=2, logits_chunk=32, remat="none",
    )
    assert out["mesh"] == {"data": 8, "model": 1}
    assert out["oom"] is None
    per_dev = out["per_device"]
    assert per_dev and per_dev["peak_bytes"] > 0
    assert out["state_bytes_per_device"] > 0
    coll = out["collectives"]
    # ZeRO-3 must actually pay its pattern: gathers for param reconstruction and a
    # reduction back to shards
    assert coll.get("all-gather", {}).get("count", 0) > 0, coll
    reduced = (coll.get("reduce-scatter", {}).get("count", 0)
               + coll.get("all-reduce", {}).get("count", 0))
    assert reduced > 0, coll
    assert out["fits_16gb"] is True  # tiny shapes trivially fit


@pytest.mark.slow
@pytest.mark.skipif(not _RUN_4B, reason="~13 min XLA:TPU AOT compile; set PT_RUN_4B_BUDGET=1")
def test_gemma3_4b_full_joint_fsdp_operating_point_fits():
    """The SHIPPED config-#4 operating point — hybrid FSDP(data=4) x TP(model=2),
    per-device batch 2, fp32 masters+moments, full remat — must fit the v5e's
    usable 15.75 GiB (measured 12.48 GiB peak, BUDGET_4B.json; pure-DP FSDP is
    structurally ~250 MiB over at any batch because every device materializes the
    full vocab-table gradient)."""
    out = budget.full_joint_budget(batch_per_device=2, logits_chunk=128,
                                   accum_steps=16, model_axis=2)
    assert out["fits_16gb"], json.dumps(out["per_device"])
    assert out["collectives"].get("all-gather", {}).get("count", 0) > 0


@pytest.mark.slow
@pytest.mark.skipif(not _RUN_4B, reason="~13 min XLA:TPU AOT compile; set PT_RUN_4B_BUDGET=1")
def test_gemma3_4b_default_shape_oom_is_structured():
    """The b=4/chunk=128 shape exceeds HBM (measured 16.47G vs 15.75G): the tool
    must report that structurally (fits_16gb False + compiler usage), not raise."""
    out = budget.full_joint_budget(batch_per_device=4, logits_chunk=128,
                                   accum_steps=8)
    assert out["fits_16gb"] is False
    assert out["oom"] and out["oom"]["used_bytes"] > out["oom"]["limit_bytes"]


def test_budget_collective_parser():
    """The HLO collective parser handles plain, async-start, and tuple-typed ops and
    sizes result buffers correctly."""
    hlo = """
  %ag = f32[8,256]{1,0} all-gather(f32[1,256] %p), replica_groups={}
  %rs = bf16[32,128]{1,0} reduce-scatter(bf16[256,128] %g), dimensions={0}
  %ar.1 = (f32[128]{0}, f32[128]{0}) all-reduce-start(f32[128] %x, f32[128] %y)
"""
    inv = budget.collective_inventory(hlo)
    assert inv["all-gather"]["count"] == 1
    assert inv["all-gather"]["result_bytes"] == 8 * 256 * 4  # operand excluded
    assert inv["reduce-scatter"]["count"] == 1
    assert inv["reduce-scatter"]["result_bytes"] == 32 * 128 * 2
    assert inv["all-reduce"]["count"] == 1
    assert inv["all-reduce"]["result_bytes"] == 2 * 128 * 4
