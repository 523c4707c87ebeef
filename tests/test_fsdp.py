"""FSDP/ZeRO-style data-axis sharding of params + Adam moments (BASELINE config #4).

The reference's only distribution is DDP with fully replicated params and optimizer
state (SURVEY §2.2); a Gemma3-4B FULL-JOINT stage-2 fine-tune (VE+projector+LLM,
`--train_ve_first_epoch` — Stage2/trainer.py:189-246) needs ~48 GB of fp32 Adam state,
which no single v5e chip holds. ``parallel.sharding fsdp=True`` shards every large leaf
over the ``data`` axis (on top of any TP axis); these tests pin:

- the rule layer: expected PartitionSpecs, small-leaf and non-divisible fallbacks;
- optimizer-state inheritance: Adam mu/nu (and MultiSteps accumulators) carry the
  exact param shardings via ``zeros_like``;
- per-device memory: local bytes of params+moments ~ total/data_axis;
- the train step: loss/param parity with an unsharded single-device run, and
  reduce-scatter (not all-reduce) for the gradient combine.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from projectiontrainer_tpu.core.mesh import MeshConfig, build_mesh
from projectiontrainer_tpu.models import decoder as dec
from projectiontrainer_tpu.models import projector as proj
from projectiontrainer_tpu.models import siglip, vlm
from projectiontrainer_tpu.parallel import (
    local_nbytes,
    param_shardings,
    shard_batch,
    shard_params,
)
from projectiontrainer_tpu.parallel.sharding import FSDP_MIN_SIZE, _with_fsdp_axis
from projectiontrainer_tpu.train import masks, optim, steps


def _wide_vlm_cfg():
    """Tiny layer count but FSDP-wide dims: every decoder/vision matmul leaf clears
    FSDP_MIN_SIZE and divides both mesh axes (data=4, model=2)."""
    vis = siglip.VisionConfig(
        hidden_size=128, intermediate_size=512, num_layers=2, num_heads=4,
        image_size=32, patch_size=8,
    )
    llm = dec.qwen3_config(
        vocab_size=4096, hidden_size=256, intermediate_size=768, num_layers=2,
        num_heads=8, num_kv_heads=4, head_dim=32,
    )
    return vlm.VLMConfig(
        vision=vis,
        projector=proj.ProjectorConfig(vision_dim=128, llm_dim=256,
                                       expansion_factor=4),
        llm=llm,
    )


@pytest.fixture(scope="module")
def wide_params():
    cfg = _wide_vlm_cfg()
    return cfg, vlm.init(jax.random.key(0), cfg)


def test_fsdp_axis_helper(cpu_mesh):
    # TP'd 2-D kernel: data axis rides the remaining (input) dim
    assert _with_fsdp_axis(P(None, "model"), (256, 512), cpu_mesh) == P("data", "model")
    # un-ruled large 2-D leaf: data axis on the largest dim
    assert _with_fsdp_axis(P(), (1024, 256), cpu_mesh) == P("data")
    assert _with_fsdp_axis(P(), (256, 1024), cpu_mesh) == P(None, "data")
    # small leaf: untouched (gather latency > memory win)
    assert _with_fsdp_axis(P(), (64, 64), cpu_mesh) == P()
    # 1-D leaf: untouched
    assert _with_fsdp_axis(P(), (100_000,), cpu_mesh) == P()
    # no dim divides the data axis: untouched
    assert _with_fsdp_axis(P(), (1023, 511), cpu_mesh) == P()
    # fully TP-consumed dims: only the free dim is eligible
    assert _with_fsdp_axis(P("model", None), (512, 513), cpu_mesh) == P("model", None)


def test_fsdp_param_specs(cpu_mesh, wide_params):
    cfg, params = wide_params
    sh = param_shardings(params, cpu_mesh, fsdp=True)
    layer = sh["llm"]["layers"][0]
    assert layer["attn"]["q_proj"]["kernel"].spec == P("data", "model")
    assert layer["mlp"]["down_proj"]["kernel"].spec == P("model", "data")
    assert sh["llm"]["embed_tokens"]["embedding"].spec == P("model", "data")
    # norm scales are tiny 1-D: replicated
    assert layer["input_norm"]["scale"].spec == P()
    # projector fc1 [128, 512] = 65536 elements: TP out-dim + data in-dim
    assert sh["projector"]["fc1"]["kernel"].spec == P("data", "model")
    # baseline (fsdp=False) keeps the r3 layout
    base = param_shardings(params, cpu_mesh, fsdp=False)
    assert base["llm"]["layers"][0]["attn"]["q_proj"]["kernel"].spec == P(None, "model")


def test_moments_inherit_fsdp_sharding(cpu_mesh, wide_params):
    cfg, params = wide_params
    placed = shard_params(params, cpu_mesh, fsdp=True)
    labels = masks.stage2_labels(
        placed, masks.Stage2Freeze(train_llm=True, use_lora=False,
                                   train_projector=True, train_vision=True)
    )
    tx, _ = optim.single_group_optimizer(labels, 1e-4, total_steps=10,
                                         clip_norm=1.0, accum_steps=2)
    state = steps.init_state(placed, tx)

    want = {
        jax.tree_util.keystr(p): leaf.sharding
        for p, leaf in jax.tree_util.tree_leaves_with_path(placed)
    }
    # every optimizer-state leaf that mirrors a param (mu/nu/MultiSteps acc_grads)
    # must carry that param's sharding; at least one sharded leaf must be seen
    checked = 0
    for path, leaf in jax.tree_util.tree_leaves_with_path(state["opt_state"]):
        ks = jax.tree_util.keystr(path)
        for pks, sharding in want.items():
            if ks.endswith(pks) and getattr(leaf, "shape", None) is not None:
                if leaf.shape == sharding.shard_shape(leaf.shape):
                    continue  # shape happens to equal a full-replicated shard
                assert leaf.sharding == sharding, f"{ks}: {leaf.sharding} != {sharding}"
                checked += 1
                break
    assert checked >= 20, f"only {checked} sharded optimizer leaves verified"


def test_fsdp_local_memory(cpu_mesh, wide_params):
    cfg, params = wide_params
    placed = shard_params(params, cpu_mesh, fsdp=True)
    labels = masks.stage2_labels(
        placed, masks.Stage2Freeze(train_llm=True, use_lora=False,
                                   train_projector=True, train_vision=True)
    )
    tx, _ = optim.single_group_optimizer(labels, 1e-4, total_steps=10)
    state = steps.init_state(placed, tx)

    total = sum(l.nbytes for l in jax.tree_util.tree_leaves(placed))
    # replicated residue: leaves whose sharding has no data axis
    residue = sum(
        l.nbytes for l in jax.tree_util.tree_leaves(placed)
        if "data" not in jax.tree_util.tree_flatten(l.sharding.spec)[0]
    )
    n_data = cpu_mesh.shape["data"]
    local_p = local_nbytes(placed)
    assert local_p <= (total - residue) / n_data + residue + 1
    # params + mu + nu + accumulators all shrink together
    local_all = local_nbytes(state)
    assert local_all < 2.1 * (total / n_data + residue)
    # and the fully-replicated layout is ~n_data times bigger
    repl = shard_params(params, cpu_mesh, fsdp=False)
    assert local_nbytes(repl) > 2.5 * local_p


def _run_steps(params, mesh, cfg, *, fsdp, n_steps=3, batch_size=8):
    if mesh is not None:
        placed = shard_params(params, mesh, fsdp=fsdp)
        shardings = param_shardings(params, mesh, fsdp=True) if fsdp else None
    else:
        placed, shardings = params, None
    labels = masks.stage2_labels(
        placed, masks.Stage2Freeze(train_llm=True, use_lora=False,
                                   train_projector=True, train_vision=True)
    )
    tx, _ = optim.single_group_optimizer(labels, 1e-3, total_steps=10, clip_norm=1.0,
                                         clip_per_module=True, accum_steps=2)
    loss_fn = steps.stage2_loss(cfg, 0, remat=False, logits_chunk=64,
                                table_frozen=False)
    step = steps.make_train_step(loss_fn, tx, donate=False,
                                 trainable_mask=masks.bool_mask(labels),
                                 param_shardings=shardings)
    state = steps.init_state(placed, tx)
    rng = np.random.default_rng(7)
    losses = []
    for i in range(n_steps):
        batch = {
            "pixel_values": rng.normal(size=(batch_size, 32, 32, 3)).astype(np.float32),
            "question_ids": rng.integers(1, cfg.llm.vocab_size, size=(batch_size, 8)),
            "answer_ids": rng.integers(1, cfg.llm.vocab_size, size=(batch_size, 12)),
        }
        if mesh is not None:
            batch = shard_batch(batch, mesh)
        else:
            batch = jax.tree.map(jnp.asarray, batch)
        state, loss, _ = step(state, batch, jax.random.key(i))
        losses.append(float(loss))
    return losses, state


def test_fsdp_full_joint_parity(cpu_mesh, wide_params):
    """Full-joint (VE+projector+LLM all trainable) steps under the FSDP {data:4,
    model:2} layout must reproduce the single-device run bit-for-bit-ish (fp32 CPU):
    sharding is a layout decision, not a numerics one."""
    cfg, params = wide_params
    ref_losses, ref_state = _run_steps(params, None, cfg, fsdp=False)
    fsdp_losses, fsdp_state = _run_steps(params, cpu_mesh, cfg, fsdp=True)
    # the functional parity check: identical loss TRAJECTORY (step 2/3 losses see
    # the step 1/2 updates, so any systematic update divergence compounds here)
    np.testing.assert_allclose(fsdp_losses, ref_losses, rtol=1e-5, atol=1e-6)

    # gradient-level parity, tight: grads are a pure function of (params, batch) —
    # only reduction-order noise distinguishes the sharded run
    loss_fn = steps.stage2_loss(cfg, 0, remat=False, logits_chunk=64,
                                table_frozen=False)
    rng = np.random.default_rng(7)
    raw = {
        "pixel_values": rng.normal(size=(8, 32, 32, 3)).astype(np.float32),
        "question_ids": rng.integers(1, cfg.llm.vocab_size, size=(8, 8)),
        "answer_ids": rng.integers(1, cfg.llm.vocab_size, size=(8, 12)),
    }
    gfun = jax.jit(jax.grad(lambda p, b: loss_fn(p, b, None)[0]))
    g_ref = gfun(params, jax.tree.map(jnp.asarray, raw))
    placed = shard_params(params, cpu_mesh, fsdp=True)
    g_fsdp = gfun(placed, shard_batch(dict(raw), cpu_mesh))
    for (pa, a), (_, b) in zip(
        jax.tree_util.tree_leaves_with_path(g_ref),
        jax.tree_util.tree_leaves_with_path(g_fsdp),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5,
            err_msg=jax.tree_util.keystr(pa),
        )

    # Param-level: bound gross divergence only. Elementwise equality is NOT expected
    # everywhere — leaves with analytically-zero gradients (e.g. attention k_proj
    # bias under softmax shift-invariance) get Adam updates of pure float noise
    # normalized to ~lr in BOTH runs, so those elements legitimately differ by
    # O(n_steps * lr) = 3e-3. A real bug (e.g. grad deflation by the shard count)
    # shows up orders of magnitude larger and in the grad check above.
    for (pa, a), (_, b) in zip(
        jax.tree_util.tree_leaves_with_path(ref_state["params"]),
        jax.tree_util.tree_leaves_with_path(fsdp_state["params"]),
    ):
        d = np.abs(np.asarray(a, np.float64) - np.asarray(b, np.float64)).max()
        assert d < 2e-2, f"{jax.tree_util.keystr(pa)}: max param diff {d}"
    # updated params keep the FSDP layout (the with_sharding_constraint held)
    q = fsdp_state["params"]["llm"]["layers"][0]["attn"]["q_proj"]["kernel"]
    assert q.sharding.spec == P("data", "model")


def test_fsdp_grads_are_sharded(cpu_mesh, wide_params):
    """The gradient combine across the data axis must leave each device holding only
    its grad SHARD (ZeRO-2 semantics — on TPU this lowers to reduce-scatter; CPU's
    expander may rewrite the collective, so the test pins the layout contract, not
    the op name): jitted grads constrained to the FSDP shardings come back sharded,
    never as full replicated gradients."""
    cfg, params = wide_params
    placed = shard_params(params, cpu_mesh, fsdp=True)
    shardings = param_shardings(params, cpu_mesh, fsdp=True)
    loss_fn = steps.stage2_loss(cfg, 0, remat=False, logits_chunk=64,
                                table_frozen=False)

    @jax.jit
    def grads_of(p, batch):
        g = jax.grad(lambda p: loss_fn(p, batch, None)[0])(p)
        return jax.tree.map(jax.lax.with_sharding_constraint, g, shardings)

    rng = np.random.default_rng(0)
    batch = shard_batch(
        {
            "pixel_values": rng.normal(size=(8, 32, 32, 3)).astype(np.float32),
            "question_ids": rng.integers(1, cfg.llm.vocab_size, size=(8, 8)),
            "answer_ids": rng.integers(1, cfg.llm.vocab_size, size=(8, 12)),
        },
        cpu_mesh,
    )
    g = grads_of(placed, batch)
    gq = g["llm"]["layers"][0]["attn"]["q_proj"]["kernel"]
    assert gq.sharding.spec == P("data", "model")
    # the device-local shard really is 1/8th of the leaf
    assert gq.sharding.shard_shape(gq.shape) == (gq.shape[0] // 4, gq.shape[1] // 2)
    gd = g["llm"]["layers"][0]["mlp"]["down_proj"]["kernel"]
    assert gd.sharding.spec == P("model", "data")
    ge = g["llm"]["embed_tokens"]["embedding"]
    assert ge.sharding.spec == P("model", "data")
