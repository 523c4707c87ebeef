"""Flash-attention kernel correctness vs the XLA reference path (interpret mode on CPU):
forward and gradients, across causal/sliding-window/padding-mask/GQA configurations."""

import functools

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from projectiontrainer_tpu.ops.attention import dot_product_attention
from projectiontrainer_tpu.ops.flash_attention import flash_attention

TOL = dict(rtol=2e-3, atol=2e-3)


def make_qkv(b=2, t=160, hq=4, hkv=2, d=64, seed=0):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.normal(size=(b, t, hq, d)).astype(np.float32))
    k = jnp.asarray(rng.normal(size=(b, t, hkv, d)).astype(np.float32))
    v = jnp.asarray(rng.normal(size=(b, t, hkv, d)).astype(np.float32))
    return q, k, v


CASES = [
    dict(causal=False, window=None, masked=False),
    dict(causal=True, window=None, masked=False),
    dict(causal=True, window=48, masked=False),
    dict(causal=False, window=None, masked=True),
    dict(causal=True, window=None, masked=True),
]


@pytest.mark.parametrize("case", CASES)
def test_flash_forward_matches_reference(case):
    q, k, v = make_qkv()
    kv_mask = None
    if case["masked"]:
        kv_mask = jnp.asarray(
            np.random.default_rng(1).random((2, 160)) > 0.2
        )
    ref = dot_product_attention(
        q, k, v, causal=case["causal"], window=case["window"], kv_mask=kv_mask
    )
    out = flash_attention(
        q, k, v, causal=case["causal"], window=case["window"], kv_mask=kv_mask,
        bq=64, bk=64, interpret=True,
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), **TOL)


def test_flash_forward_unaligned_length():
    q, k, v = make_qkv(t=150)  # not a multiple of the block size
    ref = dot_product_attention(q, k, v, causal=True)
    out = flash_attention(q, k, v, causal=True, bq=64, bk=64, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), **TOL)


@pytest.mark.parametrize("case", CASES[:3])
def test_flash_grads_match_reference(case):
    q, k, v = make_qkv(b=1, t=96, hq=2, hkv=1, d=64)

    def loss_ref(q, k, v):
        return jnp.sum(
            dot_product_attention(q, k, v, causal=case["causal"], window=case["window"])
            ** 2
        )

    def loss_flash(q, k, v):
        return jnp.sum(
            flash_attention(q, k, v, causal=case["causal"], window=case["window"],
                            bq=32, bk=32, interpret=True) ** 2
        )

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(g_flash, g_ref, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), err_msg=name, **TOL)


@pytest.mark.parametrize("hq,hkv,d", [(4, 4, 128), (4, 2, 128), (8, 8, 256)])
def test_flash_bthd_native_layout_fwd_and_grads(hq, hkv, d):
    """The merged-lane path (non-causal unmasked exact blocks — the SigLIP
    tower case that previously paid 38.8 ms/step of layout copies): must route
    through _flash_lanes and match the XLA reference for fwd + all grads,
    including the GQA head-group reduction."""
    from projectiontrainer_tpu.ops import flash_attention as FA

    t = 128  # multiple of the block => t_pad == t => bthd gate opens
    q, k, v = make_qkv(b=2, t=t, hq=hq, hkv=hkv, d=d, seed=7)
    assert FA._lanes_supported(2, t, hq, hkv, d, causal=False, window=None,
                               kv_mask=None, bq=64, bk=64)

    ref = dot_product_attention(q, k, v)
    out = flash_attention(q, k, v, bq=64, bk=64, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), **TOL)

    def loss(fn):
        return lambda q, k, v: jnp.sum(fn(q, k, v) ** 2)

    g_ref = jax.grad(loss(lambda q, k, v: dot_product_attention(q, k, v)),
                     argnums=(0, 1, 2))(q, k, v)
    g_fl = jax.grad(
        loss(lambda q, k, v: flash_attention(q, k, v, bq=64, bk=64, interpret=True)),
        argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(g_fl, g_ref, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), err_msg=name, **TOL)


def test_flash_lanes_padded_d72_direct():
    """The lanes kernels' zero-pad branch (_merge_heads with dp != d) stays correct
    even though the public gate routes D=72 to BHTD — exercised directly so a
    future gate change can't silently ship an untested pad path."""
    from projectiontrainer_tpu.ops.flash_attention import _flash_lanes

    q, k, v = make_qkv(b=2, t=128, hq=8, hkv=8, d=72, seed=11)
    ref = dot_product_attention(q, k, v)
    out = _flash_lanes(q, k, v, 72 ** -0.5, 64, 64, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), **TOL)

    def loss(fn):
        return lambda q, k, v: jnp.sum(fn(q, k, v) ** 2)

    g_ref = jax.grad(loss(lambda q, k, v: dot_product_attention(q, k, v)),
                     argnums=(0, 1, 2))(q, k, v)
    g_l = jax.grad(loss(lambda q, k, v: _flash_lanes(q, k, v, 72 ** -0.5, 64, 64,
                                                     True)),
                   argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(g_l, g_ref, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), err_msg=name, **TOL)


def test_flash_bthd_gate():
    from projectiontrainer_tpu.ops.flash_attention import _lanes_supported

    ok = dict(causal=False, window=None, kv_mask=None, bq=64, bk=64)
    assert _lanes_supported(2, 128, 4, 4, 128, **ok)
    assert _lanes_supported(2, 128, 8, 8, 256, **ok)
    # causal / masked / windowed / ragged shapes stay on the BHTD path
    assert not _lanes_supported(2, 128, 4, 4, 128, **{**ok, "causal": True})
    assert not _lanes_supported(2, 128, 4, 4, 128, **{**ok, "window": 32})
    assert not _lanes_supported(2, 150, 4, 4, 128, **ok)  # t_pad != t
    # non-128-multiple head dims (so400m 72, ViT-L 64): the padded merge was
    # measured a net loss (layout ops + 1.78x traffic + HBM overflow) — BHTD
    assert not _lanes_supported(2, 128, 16, 16, 72, **ok)
    assert not _lanes_supported(2, 128, 4, 4, 64, **ok)
    # VMEM blow-up (long t x many heads) falls back
    assert not _lanes_supported(2, 8192, 32, 32, 128, **ok)


def test_flash_grads_with_mask():
    q, k, v = make_qkv(b=2, t=64, hq=2, hkv=2, d=64, seed=3)
    kv_mask = jnp.asarray(np.random.default_rng(2).random((2, 64)) > 0.3)

    def loss(fn):
        def inner(q, k, v):
            return jnp.sum(fn(q, k, v) ** 2)
        return inner

    ref_fn = loss(lambda q, k, v: dot_product_attention(q, k, v, causal=True, kv_mask=kv_mask))
    flash_fn = loss(lambda q, k, v: flash_attention(
        q, k, v, causal=True, kv_mask=kv_mask, bq=32, bk=32, interpret=True))
    g_ref = jax.grad(ref_fn, argnums=(0, 1, 2))(q, k, v)
    g_flash = jax.grad(flash_fn, argnums=(0, 1, 2))(q, k, v)
    for a, b, name in zip(g_flash, g_ref, "qkv"):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), err_msg=name, **TOL)


def test_flash_unaligned_head_dim_fwd_and_grads():
    """D=72 (so400m's 1152/16) exercises the zero-pad-to-64-multiple path added for
    the stage-0 vision tower: forward and all three grads must match XLA exactly."""
    q, k, v = make_qkv(t=96, hq=4, hkv=4, d=72, seed=3)

    def loss(f, *a):
        return jnp.sum(f(*a) ** 2)

    ref_fn = lambda q, k, v: dot_product_attention(q, k, v, causal=False)
    out_fn = lambda q, k, v: flash_attention(q, k, v, causal=False, bq=32, bk=32,
                                             interpret=True)
    np.testing.assert_allclose(np.asarray(out_fn(q, k, v)),
                               np.asarray(ref_fn(q, k, v)), **TOL)
    g_ref = jax.grad(lambda *a: loss(ref_fn, *a), argnums=(0, 1, 2))(q, k, v)
    g_out = jax.grad(lambda *a: loss(out_fn, *a), argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_out, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), **TOL)


def test_sharded_flash_matches_reference_on_virtual_mesh():
    """shard_map-wrapped flash (batch over data, query heads over model, replicated
    1-head KV — the GQA case) vs the XLA reference on the 8-device CPU mesh, fwd and
    grads, interpret mode."""
    from projectiontrainer_tpu.core.mesh import MeshConfig, build_mesh
    from projectiontrainer_tpu.ops.flash_attention import (
        sharded_flash_attention, sharded_flash_plan,
    )

    mesh = build_mesh(MeshConfig(data=4, model=2))
    q, k, v = make_qkv(b=4, t=96, hq=4, hkv=1, d=64, seed=9)
    kv_mask = jnp.asarray(np.random.default_rng(2).random((4, 96)) > 0.15)

    plan = sharded_flash_plan(mesh, q, k)
    assert plan is not None
    q_spec, kv_spec, _, _ = plan
    assert q_spec[2] == "model" and kv_spec[2] is None  # 1 KV head stays replicated

    def loss(f, *a):
        return jnp.sum(f(*a).astype(jnp.float32) ** 2)

    ref_fn = lambda q, k, v: dot_product_attention(q, k, v, causal=True, kv_mask=kv_mask)
    out_fn = lambda q, k, v: sharded_flash_attention(
        mesh, q, k, v, causal=True, kv_mask=kv_mask, interpret=True
    )
    np.testing.assert_allclose(np.asarray(out_fn(q, k, v)),
                               np.asarray(ref_fn(q, k, v)), **TOL)
    g_ref = jax.grad(lambda *a: loss(ref_fn, *a), argnums=(0, 1, 2))(q, k, v)
    g_out = jax.jit(jax.grad(lambda *a: loss(out_fn, *a), argnums=(0, 1, 2)))(q, k, v)
    for a, b in zip(g_out, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), **TOL)


def test_sharded_flash_plan_rejects_indivisible_shapes():
    from projectiontrainer_tpu.core.mesh import MeshConfig, build_mesh
    from projectiontrainer_tpu.ops.flash_attention import sharded_flash_plan

    mesh = build_mesh(MeshConfig(data=4, model=2))
    q, k, _ = make_qkv(b=4, t=32, hq=3, hkv=3, d=64)  # 3 heads % model=2 != 0
    assert sharded_flash_plan(mesh, q, k) is None
    q2, k2, _ = make_qkv(b=6, t=32, hq=4, hkv=4, d=64)  # 6 batch % data=4 != 0
    assert sharded_flash_plan(mesh, q2, k2) is None


def test_sharded_flash_plan_rejects_replicated_multihead_kv():
    """GQA with 1 < hkv and hkv % model_size != 0 must be rejected: a replicated
    multi-head KV makes the per-shard kernel map local query heads onto KV heads
    starting at 0, but globally each shard's query heads belong to a different KV
    group — shard s>0 would attend with the wrong KV head."""
    from projectiontrainer_tpu.core.mesh import MeshConfig, build_mesh
    from projectiontrainer_tpu.ops.flash_attention import sharded_flash_plan

    mesh = build_mesh(MeshConfig(data=2, model=4))
    # hq=32, hkv=2: hq%4==0 and (hq/4)%2==0 — the old plan accepted this wrongly
    q, k, _ = make_qkv(b=4, t=32, hq=32, hkv=2, d=64)
    assert sharded_flash_plan(mesh, q, k) is None
    # hkv==1 replicated stays supported
    q1, k1, _ = make_qkv(b=4, t=32, hq=32, hkv=1, d=64)
    assert sharded_flash_plan(mesh, q1, k1) is not None
    # hkv divisible by model size shards alongside Q — supported
    q4, k4, _ = make_qkv(b=4, t=32, hq=32, hkv=4, d=64)
    plan = sharded_flash_plan(mesh, q4, k4)
    assert plan is not None and plan[1][2] == "model"


def test_auto_blocks_minimize_padding():
    """Pad-minimizing auto block choice (r3): padded rows are real MXU work, so the
    choice minimizes t_pad before anything else. Pins the production decisions:
    ViT T=576 exact (mask-free kernel), so400m T=1024 exact, Gemma T=1087 causal ->
    384-blocks (pad 1152, not the old 512/256 default's 1280 — measured 1.42x),
    stage-2 T=1855 -> 384-blocks (pad 1920, not 2048)."""
    from projectiontrainer_tpu.ops import flash_attention as fa

    assert fa._auto_blocks(576, causal=False, has_mask=False) == (576, 576)
    assert fa._auto_blocks(1024, causal=False, has_mask=False) == (1024, 1024)
    assert fa._auto_blocks(2048, causal=False, has_mask=False) == (1024, 1024)
    assert fa._auto_blocks(1087, causal=True, has_mask=True) == (384, 384)
    assert fa._auto_blocks(1855, causal=True, has_mask=True) == (384, 384)  # pad 1920
    assert fa._auto_blocks(16, causal=True, has_mask=False) == (128, 128)
    # t_pad for the picked causal blocks never exceeds any candidate's
    for t in (9, 100, 576, 1000, 1087, 1855, 4000):
        blk, _ = fa._auto_blocks(t, causal=True, has_mask=True)
        t_pad = -(-t // blk) * blk
        assert all(t_pad <= -(-t // c) * c for c in (128, 256, 384, 512)), (t, blk)

    # end-to-end: the kernel still matches the XLA reference at the exact-block
    # (mask-free) T=576 shape and at an unaligned causal length
    rng = np.random.default_rng(0)
    q, k, v = (jnp.asarray(rng.normal(size=(1, 576, 2, 32)).astype(np.float32)) * 0.1
               for _ in range(3))
    out = flash_attention(q, k, v, interpret=True)
    ref = dot_product_attention(q, k, v, causal=False, impl="xla")
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=2e-3, rtol=2e-3)
    q2, k2, v2 = (jnp.asarray(rng.normal(size=(1, 391, 2, 32)).astype(np.float32)) * 0.1
                  for _ in range(3))
    out2 = flash_attention(q2, k2, v2, causal=True, interpret=True)
    ref2 = dot_product_attention(q2, k2, v2, causal=True, impl="xla")
    np.testing.assert_allclose(np.asarray(out2), np.asarray(ref2), atol=2e-3, rtol=2e-3)
