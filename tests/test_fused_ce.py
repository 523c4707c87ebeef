"""Parity of the Pallas fused linear+CE kernel (ops/fused_ce.py) vs the chunked XLA
path — fwd loss and hidden-gradients, incl. -100 masking, sample weights, and a vocab
size that does not divide the kernel's vocab tile (the masked-tail path)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from projectiontrainer_tpu.train import losses


def _data(b=2, t=18, d=128, v=1000, seed=0):
    rng = np.random.default_rng(seed)
    hidden = jnp.asarray(rng.normal(size=(b, t, d)).astype(np.float32))
    table = jnp.asarray(rng.normal(size=(v, d)).astype(np.float32) * 0.05)
    labels = rng.integers(0, v, size=(b, t))
    labels[0, :5] = -100  # visual-prefix style ignore block
    labels[-1, -3:] = -100
    return hidden, table, jnp.asarray(labels)


@pytest.mark.parametrize("weights", [None, np.array([1.0, 0.0])])
def test_fused_matches_chunked_fwd_and_grad(weights):
    hidden, table, labels = _data()
    w = None if weights is None else jnp.asarray(weights, jnp.float32)

    def chunked(h):
        return losses.chunked_shifted_clm_loss(
            h, table, labels, chunk_size=7, sample_weights=w
        )[0]

    def fused(h):
        return losses.fused_shifted_clm_loss(
            h, table, labels, sample_weights=w, interpret=True
        )[0]

    l_ref, g_ref = jax.value_and_grad(chunked)(hidden)
    l_fused, g_fused = jax.value_and_grad(fused)(hidden)
    np.testing.assert_allclose(float(l_fused), float(l_ref), rtol=2e-5)
    np.testing.assert_allclose(
        np.asarray(g_fused), np.asarray(g_ref), rtol=2e-4, atol=2e-6
    )


def test_fused_count_matches():
    hidden, table, labels = _data(seed=1)
    _, n_ref = losses.chunked_shifted_clm_loss(hidden, table, labels, chunk_size=16)
    _, n_fused = losses.fused_shifted_clm_loss(hidden, table, labels, interpret=True)
    assert int(n_ref) == int(n_fused)


def test_fused_table_grad_is_contract_zero():
    """The frozen-table contract: the table cotangent is hard zero (callers must keep
    the vocab table frozen — documented in ops/fused_ce.py)."""
    hidden, table, labels = _data(b=1, t=9, v=512, seed=2)

    def f(tab):
        return losses.fused_shifted_clm_loss(hidden, tab, labels, interpret=True)[0]

    g = jax.grad(f)(table)
    assert float(jnp.max(jnp.abs(g))) == 0.0


def test_fused_vocab_tile_exact_multiple():
    """V an exact multiple of the vocab tile exercises the no-padding branch."""
    hidden, table, labels = _data(v=1024, seed=3)
    l_ref, _ = losses.chunked_shifted_clm_loss(hidden, table, labels, chunk_size=8)
    l_fused, _ = losses.fused_shifted_clm_loss(hidden, table, labels, interpret=True)
    np.testing.assert_allclose(float(l_fused), float(l_ref), rtol=2e-5)


def test_fused_shard_map_data_parallel_matches_chunked():
    """Under a data-parallel mesh the fused loss wraps the kernel in shard_map (each
    device's batch shard against the replicated table — losses.fused_shifted_clm_loss).
    Verified on the 8-device virtual CPU mesh in interpret mode against the chunked
    GSPMD path, including sharded inputs placed via NamedSharding."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from projectiontrainer_tpu.core.mesh import MeshConfig, build_mesh

    mesh = build_mesh(MeshConfig(data=8, model=1))
    hidden, table, labels = _data(b=8, t=12, d=128, v=512, seed=5)
    hidden = jax.device_put(hidden, NamedSharding(mesh, P("data")))
    labels = jax.device_put(labels, NamedSharding(mesh, P("data")))
    table = jax.device_put(table, NamedSharding(mesh, P()))

    def chunked(h):
        return losses.chunked_shifted_clm_loss(h, table, labels, chunk_size=8)[0]

    def fused(h):
        return losses.fused_shifted_clm_loss(
            h, table, labels, interpret=True, mesh=mesh
        )[0]

    l_ref, g_ref = jax.jit(jax.value_and_grad(chunked))(hidden)
    l_f, g_f = jax.jit(jax.value_and_grad(fused))(hidden)
    np.testing.assert_allclose(float(l_f), float(l_ref), rtol=2e-5)
    np.testing.assert_allclose(np.asarray(g_f), np.asarray(g_ref), rtol=2e-4, atol=2e-6)


def test_fused_vocab_parallel_matches_chunked_on_tp_mesh():
    """TP mesh (data=4, model=2): the vocab-parallel fused path — table sharded on
    its vocab dim, per-shard kernel sweeps + psum/pmax combines — must match the
    chunked GSPMD path in loss AND hidden-gradient (VERDICT r1 item 1)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from projectiontrainer_tpu.core.mesh import MeshConfig, build_mesh

    mesh = build_mesh(MeshConfig(data=4, model=2))
    hidden, table, labels = _data(b=8, t=10, d=128, v=256, seed=6)
    hidden = jax.device_put(hidden, NamedSharding(mesh, P("data")))
    labels = jax.device_put(labels, NamedSharding(mesh, P("data")))
    table = jax.device_put(table, NamedSharding(mesh, P("model")))

    def chunked(h):
        return losses.chunked_shifted_clm_loss(h, table, labels, chunk_size=8)[0]

    def fused(h):
        return losses.fused_shifted_clm_loss(
            h, table, labels, interpret=True, mesh=mesh
        )[0]

    l_ref, g_ref = jax.jit(jax.value_and_grad(chunked))(hidden)
    l_f, g_f = jax.jit(jax.value_and_grad(fused))(hidden)
    np.testing.assert_allclose(float(l_f), float(l_ref), rtol=2e-5)
    np.testing.assert_allclose(np.asarray(g_f), np.asarray(g_ref), rtol=2e-4, atol=2e-6)


def test_fused_vocab_parallel_weighted_and_table_grad_zero():
    """Sample weights flow through the vocab-parallel path; table cotangent stays
    hard zero (frozen-table contract holds under TP too)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from projectiontrainer_tpu.core.mesh import MeshConfig, build_mesh

    mesh = build_mesh(MeshConfig(data=2, model=4))
    hidden, table, labels = _data(b=4, t=9, d=64, v=512, seed=8)
    w = jnp.asarray([1.0, 0.0, 1.0, 1.0], jnp.float32)
    l_ref, n_ref = losses.chunked_shifted_clm_loss(
        hidden, table, labels, chunk_size=8, sample_weights=w)
    l_f, n_f = losses.fused_shifted_clm_loss(
        hidden, table, labels, sample_weights=w, interpret=True, mesh=mesh)
    np.testing.assert_allclose(float(l_f), float(l_ref), rtol=2e-5)
    assert int(n_ref) == int(n_f)
    g_tab = jax.grad(lambda tab: losses.fused_shifted_clm_loss(
        hidden, tab, labels, interpret=True, mesh=mesh)[0])(table)
    assert float(jnp.max(jnp.abs(g_tab))) == 0.0


def test_fused_vocab_parallel_rejects_indivisible_vocab():
    from projectiontrainer_tpu.core.mesh import MeshConfig, build_mesh

    mesh = build_mesh(MeshConfig(data=4, model=2))
    hidden, table, labels = _data(b=8, t=10, d=128, v=255, seed=6)
    with pytest.raises(ValueError, match="must divide"):
        losses.fused_shifted_clm_loss(hidden, table, labels, interpret=True, mesh=mesh)


def test_fused_bf16_inputs_interpret():
    """bf16 hidden/table (the production dtype) through the kernel in interpret mode:
    loss must track the chunked bf16 path within bf16 tolerance."""
    hidden, table, labels = _data(b=2, t=14, d=128, v=640, seed=7)
    hb, tb = hidden.astype(jnp.bfloat16), table.astype(jnp.bfloat16)
    l_ref, _ = losses.chunked_shifted_clm_loss(hb, tb, labels, chunk_size=8)
    l_f, _ = losses.fused_shifted_clm_loss(hb, tb, labels, interpret=True)
    np.testing.assert_allclose(float(l_f), float(l_ref), rtol=2e-2)
