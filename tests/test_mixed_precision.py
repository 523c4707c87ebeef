"""Mixed-precision policy: bf16 compute with fp32 masters via the in-loss params cast
(core/dtypes.cast_compute_params), the reference's `accelerate --mixed_precision bf16`
equivalent (Stage2/run_vqa_train_stage2.sh:73)."""

import jax
import jax.numpy as jnp
import numpy as np

from projectiontrainer_tpu.core.dtypes import cast_compute_params
from projectiontrainer_tpu.models import siglip
from projectiontrainer_tpu.train import steps


def test_cast_skips_quant_scales_and_int_storage():
    tree = {
        "dense": {"kernel": jnp.ones((4, 4), jnp.float32)},
        "quant": {
            "qvalues": jnp.ones((4, 4), jnp.int8),
            "scales": jnp.ones((4,), jnp.float32),
            "packed_nf4": jnp.ones((2, 4), jnp.uint8),
            "block_scales": jnp.ones((1, 4), jnp.float32),
        },
        "norm": {"scale": jnp.ones((4,), jnp.float32)},
    }
    out = cast_compute_params(tree, jnp.bfloat16)
    assert out["dense"]["kernel"].dtype == jnp.bfloat16
    assert out["norm"]["scale"].dtype == jnp.bfloat16  # norms upcast internally anyway
    assert out["quant"]["qvalues"].dtype == jnp.int8
    assert out["quant"]["packed_nf4"].dtype == jnp.uint8
    # dequantization scales must stay fp32 (bitsandbytes keeps them fp32 too)
    assert out["quant"]["scales"].dtype == jnp.float32
    assert out["quant"]["block_scales"].dtype == jnp.float32


def _tiny_siglip():
    cfg = siglip.SiglipConfig(
        vision=siglip.VisionConfig(hidden_size=24, intermediate_size=48, num_layers=2,
                                   num_heads=2, image_size=16, patch_size=8),
        text=siglip.TextConfig(hidden_size=24, intermediate_size=48, num_layers=2,
                               num_heads=2, vocab_size=64,
                               max_position_embeddings=8),
    )
    params = siglip.init(jax.random.key(0), cfg, jnp.float32)
    rng = np.random.default_rng(0)
    batch = {
        "pixel_values": jnp.asarray(rng.normal(size=(4, 16, 16, 3)), jnp.float32),
        "input_ids": jnp.asarray(rng.integers(1, 64, size=(4, 8))),
    }
    return cfg, params, batch


def test_stage0_bf16_compute_close_to_fp32_with_fp32_grads():
    cfg, params, batch = _tiny_siglip()
    loss_f32 = steps.stage0_loss(cfg)
    loss_bf16 = steps.stage0_loss(cfg, compute_dtype=jnp.bfloat16)

    l_ref, _ = loss_f32(params, batch, None)
    (l_mp, _), grads = jax.value_and_grad(
        lambda p: loss_bf16(p, batch, None), has_aux=True
    )(params)
    # bf16 matmuls on a 2-layer tower: close but not identical
    np.testing.assert_allclose(float(l_mp), float(l_ref), rtol=3e-2)
    # cotangents accumulate back into the fp32 masters
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(g.dtype == jnp.float32 for g in leaves)
    assert any(float(jnp.max(jnp.abs(g))) > 0 for g in leaves)
