"""Split prefix/generated decode attention vs the monolithic-cache reference.

The op must reproduce the monolithic decode step exactly: a query at cache slot
``prefix_len + t`` attending over [prefix keys (padding-masked); generated keys j <= t],
with sliding windows measured in cache-slot space. The reference here is
``ops.attention.dot_product_attention`` over the concatenated cache with an explicit
validity mask — the same math the monolithic decode path runs.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from projectiontrainer_tpu.ops.attention import dot_product_attention
from projectiontrainer_tpu.ops.decode_attention import (
    decode_attention,
    pallas_decode_supported,
)


def make_case(b=2, nb=3, p=160, g=96, hq=4, hkv=2, d=64, t=37, window=None,
              dtype=np.float32, seed=0):
    rng = np.random.default_rng(seed)
    r = b * nb
    # caches are head-major: [B, Hkv, P, D] prefix, [R, Hkv, G, D] generated
    q = rng.normal(size=(r, hq, d)).astype(dtype)
    kp = rng.normal(size=(b, hkv, p, d)).astype(dtype)
    vp = rng.normal(size=(b, hkv, p, d)).astype(dtype)
    kg = rng.normal(size=(r, hkv, g, d)).astype(dtype)
    vg = rng.normal(size=(r, hkv, g, d)).astype(dtype)
    # left-padded prefix mask with ragged per-sample pad counts
    pm = np.ones((b, p), np.int32)
    for i in range(b):
        pm[i, : (i * 7) % (p // 2)] = 0
    return dict(q=q, kp=kp, vp=vp, kg=kg, vg=vg, prefix_mask=pm, t=t,
                prefix_len=p, window=window)


def reference(case, scale):
    """Monolithic-cache decode step via dot_product_attention + explicit mask."""
    q, kp, vp, kg, vg = (jnp.asarray(case[k], jnp.float32)
                         for k in ("q", "kp", "vp", "kg", "vg"))
    # back to the monolithic seq-major layout [*, T, hkv, d] for the reference
    kp, vp = jnp.swapaxes(kp, 1, 2), jnp.swapaxes(vp, 1, 2)
    kg, vg = jnp.swapaxes(kg, 1, 2), jnp.swapaxes(vg, 1, 2)
    b, p = case["prefix_mask"].shape
    r, g = kg.shape[0], kg.shape[1]
    nb = r // b
    t, window = case["t"], case["window"]

    k_full = jnp.concatenate([jnp.repeat(kp, nb, axis=0), kg], axis=1)  # [R, P+G, hkv, d]
    v_full = jnp.concatenate([jnp.repeat(vp, nb, axis=0), vg], axis=1)
    valid_p = np.repeat(case["prefix_mask"].astype(bool), nb, axis=0)   # [R, P]
    valid_g = np.broadcast_to(np.arange(g) <= t, (r, g)).copy()
    if window is not None:
        q_slot = p + t
        slots = np.arange(p + g)
        valid = np.concatenate([valid_p, valid_g], axis=1) & (slots > q_slot - window)
    else:
        valid = np.concatenate([valid_p, valid_g], axis=1)
    out = dot_product_attention(
        q[:, None], k_full, v_full, scale=scale, causal=False,
        kv_mask=jnp.asarray(valid),
    )
    return np.asarray(out[:, 0])


@pytest.mark.parametrize("window", [None, 80])
@pytest.mark.parametrize("t", [0, 37, 95])
def test_xla_matches_monolithic(window, t):
    case = make_case(t=t, window=window)
    scale = case["q"].shape[-1] ** -0.5
    out = decode_attention(
        jnp.asarray(case["q"]), jnp.asarray(case["kp"]), jnp.asarray(case["vp"]),
        jnp.asarray(case["kg"]), jnp.asarray(case["vg"]),
        prefix_mask=jnp.asarray(case["prefix_mask"]), t=case["t"],
        prefix_len=case["prefix_len"], scale=scale, window=window, impl="xla",
    )
    ref = reference(case, scale)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=2e-3, atol=2e-3)


def test_xla_no_beams_single_row():
    case = make_case(b=3, nb=1, t=5)
    scale = 0.125
    out = decode_attention(
        jnp.asarray(case["q"]), jnp.asarray(case["kp"]), jnp.asarray(case["vp"]),
        jnp.asarray(case["kg"]), jnp.asarray(case["vg"]),
        prefix_mask=jnp.asarray(case["prefix_mask"]), t=case["t"],
        prefix_len=case["prefix_len"], scale=scale, window=None, impl="xla",
    )
    np.testing.assert_allclose(np.asarray(out), reference(case, scale),
                               rtol=2e-3, atol=2e-3)


@pytest.mark.parametrize("window", [None, 256])
def test_pallas_matches_xla(window):
    # kernel gate needs bf16 + 128-multiple P/G/D
    case = make_case(b=2, nb=3, p=256, g=128, hq=4, hkv=2, d=128, t=41,
                     window=window, dtype=np.float32)
    to_bf16 = lambda x: jnp.asarray(x, jnp.bfloat16)
    args = [to_bf16(case[k]) for k in ("q", "kp", "vp", "kg", "vg")]
    kw = dict(prefix_mask=jnp.asarray(case["prefix_mask"]), t=case["t"],
              prefix_len=case["prefix_len"], scale=0.088, window=window)
    assert pallas_decode_supported(args[0], args[1], args[3])
    out_pl = decode_attention(*args, **kw, impl="flash", interpret=True)
    out_xla = decode_attention(*args, **kw, impl="xla")
    np.testing.assert_allclose(
        np.asarray(out_pl, np.float32), np.asarray(out_xla, np.float32),
        rtol=2e-2, atol=2e-2,
    )


def test_gate_rejects_unaligned_and_fp32():
    case = make_case(p=160, g=96, d=64)
    q = jnp.asarray(case["q"], jnp.bfloat16)
    kp = jnp.asarray(case["kp"], jnp.bfloat16)
    kg = jnp.asarray(case["kg"], jnp.bfloat16)
    assert not pallas_decode_supported(q, kp, kg)  # unaligned P/G/D
    case = make_case(p=256, g=128, d=128)
    assert not pallas_decode_supported(  # fp32
        jnp.asarray(case["q"]), jnp.asarray(case["kp"]), jnp.asarray(case["kg"])
    )
