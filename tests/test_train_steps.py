"""End-to-end tiny train-step tests: masks freeze what they should, losses go down,
the optimizer schedule matches HF, and steps run sharded on the virtual 8-device mesh."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from projectiontrainer_tpu.core.pytree import count_params
from projectiontrainer_tpu.models import decoder as dec
from projectiontrainer_tpu.models import projector as proj
from projectiontrainer_tpu.models import siglip, vlm
from projectiontrainer_tpu.train import lora as lora_mod
from projectiontrainer_tpu.train import masks, optim, steps


def tiny_vlm_cfg(llm_hidden=32, vis_hidden=24):
    vis = siglip.VisionConfig(
        hidden_size=vis_hidden, intermediate_size=vis_hidden * 2, num_layers=2,
        num_heads=4, image_size=16, patch_size=8, use_head=False,
    )
    llm = dec.gemma3_config(
        vocab_size=64, hidden_size=llm_hidden, intermediate_size=llm_hidden * 2,
        num_layers=2, num_heads=2, num_kv_heads=1, head_dim=16, sliding_window=4,
        query_pre_attn_scalar=16,
    )
    return vlm.VLMConfig(
        vision=vis,
        projector=proj.ProjectorConfig(vision_dim=vis_hidden, llm_dim=llm_hidden,
                                       expansion_factor=2),
        llm=llm,
    )


def stage1_batch(rng, b=2):
    return {
        "pixel_values": jnp.asarray(rng.normal(size=(b, 16, 16, 3)).astype(np.float32)),
        "caption_ids": jnp.asarray(
            np.concatenate([rng.integers(1, 64, size=(b, 6)), np.zeros((b, 2), np.int64)], axis=1)
        ),
    }


PAD = 0


@pytest.mark.slow
def test_stage1_step_trains_projector_only():
    cfg = tiny_vlm_cfg()
    params = vlm.init(jax.random.key(0), cfg)
    labels = masks.stage1_labels(params)
    tx, _ = optim.single_group_optimizer(
        labels, 1e-3, total_steps=10, clip_norm=5.0
    )
    loss_fn = steps.stage1_loss(cfg, PAD, remat=False)
    step = steps.make_train_step(loss_fn, tx, donate=False)

    rng = np.random.default_rng(0)
    batch = stage1_batch(rng)
    state = steps.init_state(params, tx)
    losses_seen = []
    for i in range(8):
        state, loss, aux = step(state, batch, jax.random.key(i))
        losses_seen.append(float(loss))

    # projector moved, towers frozen
    assert not np.allclose(
        np.asarray(state["params"]["projector"]["fc1"]["kernel"]),
        np.asarray(params["projector"]["fc1"]["kernel"]),
    )
    for sub in ("vision", "llm"):
        for a, b in zip(jax.tree.leaves(state["params"][sub]), jax.tree.leaves(params[sub])):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert losses_seen[-1] < losses_seen[0]
    assert int(aux["tokens"]) > 0


@pytest.mark.slow
def test_stage2_lora_step_trains_lora_only():
    cfg = tiny_vlm_cfg()
    lcfg = lora_mod.LoraConfig(r=2, alpha=4)
    params = vlm.init(jax.random.key(1), cfg)
    params["lora"] = lora_mod.init(jax.random.key(2), cfg.llm, lcfg)
    policy = masks.Stage2Freeze(train_llm=False, use_lora=True, train_projector=True)
    labels = masks.stage2_labels(params, policy)

    tx, _ = optim.single_group_optimizer(
        labels, 1e-3, total_steps=10, clip_norm=1.0, clip_per_module=True
    )
    loss_fn = steps.stage2_loss(cfg, PAD, lora_cfg=lcfg, remat=False)
    step = steps.make_train_step(loss_fn, tx, donate=False)

    rng = np.random.default_rng(1)
    batch = {
        "pixel_values": jnp.asarray(rng.normal(size=(2, 16, 16, 3)).astype(np.float32)),
        "question_ids": jnp.asarray(rng.integers(1, 64, size=(2, 4))),
        "answer_ids": jnp.asarray(
            np.concatenate([rng.integers(1, 64, size=(2, 5)), np.zeros((2, 3), np.int64)], 1)
        ),
    }
    state = steps.init_state(params, tx)
    l0 = None
    for i in range(6):
        state, loss, _ = step(state, batch, jax.random.key(i))
        l0 = l0 or float(loss)

    # lora B started at zero and moved; projector moved; base LLM/vision frozen
    assert not np.allclose(
        np.asarray(state["params"]["lora"]["layers"][0]["q_proj"]["b"]), 0.0
    )
    assert not np.allclose(
        np.asarray(state["params"]["projector"]["fc2"]["kernel"]),
        np.asarray(params["projector"]["fc2"]["kernel"]),
    )
    for sub in ("vision", "llm"):
        for a, b in zip(jax.tree.leaves(state["params"][sub]), jax.tree.leaves(params[sub])):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert float(loss) < l0


@pytest.mark.slow
def test_stage0_step_freezes_text_tower():
    cfg = siglip.SiglipConfig(
        vision=siglip.VisionConfig(hidden_size=16, intermediate_size=32, num_layers=2,
                                   num_heads=2, image_size=16, patch_size=8),
        text=siglip.TextConfig(hidden_size=16, intermediate_size=32, num_layers=2,
                               num_heads=2, vocab_size=50, max_position_embeddings=8),
    )
    params = siglip.init(jax.random.key(3), cfg)
    labels = masks.stage0_labels(
        params, freeze_layers_ratio=0.5, num_vision_layers=cfg.vision.num_layers
    )
    tx, _ = optim.single_group_optimizer(labels, 1e-3, total_steps=10)
    loss_fn = steps.stage0_loss(cfg, remat=False)
    step = steps.make_train_step(loss_fn, tx, donate=False)

    rng = np.random.default_rng(2)
    batch = {
        "pixel_values": jnp.asarray(rng.normal(size=(4, 16, 16, 3)).astype(np.float32)),
        "input_ids": jnp.asarray(rng.integers(0, 50, size=(4, 8))),
    }
    state = steps.init_state(params, tx)
    l_first = l_last = None
    for i in range(6):
        state, loss, _ = step(state, batch, jax.random.key(i))
        l_first = l_first or float(loss)
        l_last = float(loss)
    assert l_last < l_first

    # text tower + logit_scale + first vision layer frozen; second vision layer moved
    for a, b in zip(jax.tree.leaves(state["params"]["text"]), jax.tree.leaves(params["text"])):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(
        np.asarray(state["params"]["logit_scale"]), np.asarray(params["logit_scale"])
    )
    for a, b in zip(
        jax.tree.leaves(state["params"]["vision"]["layers"][0]),
        jax.tree.leaves(params["vision"]["layers"][0]),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert not np.allclose(
        np.asarray(state["params"]["vision"]["layers"][1]["mlp"]["fc1"]["kernel"]),
        np.asarray(params["vision"]["layers"][1]["mlp"]["fc1"]["kernel"]),
    )


def test_cosine_schedule_matches_hf():
    import torch
    from transformers import get_cosine_schedule_with_warmup

    total, warmup_ratio, lr = 50, 0.1, 3e-4
    import math

    warmup = math.ceil(warmup_ratio * total)
    opt = torch.optim.AdamW([torch.nn.Parameter(torch.zeros(1))], lr=lr)
    sched = get_cosine_schedule_with_warmup(opt, num_warmup_steps=warmup, num_training_steps=total)
    expected = []
    for _ in range(total):
        expected.append(opt.param_groups[0]["lr"])
        opt.step()
        sched.step()

    ours = optim.cosine_schedule_with_warmup(lr, warmup_ratio=warmup_ratio, total_steps=total)
    got = [float(ours(i)) for i in range(total)]
    np.testing.assert_allclose(got, expected, rtol=1e-6, atol=1e-9)


def test_cosine_schedule_warmup_rounding_floor_matches_stage0():
    """Stage 0 computes warmup steps as int(ratio * max_steps) — floor — where stages
    1/2 use ceil (Stage0/train_vision_encoder_stage0.py:598 vs
    Stage1/projector_trainer.py:87). With a fractional product the two schedules differ
    by one warmup step; warmup_rounding='floor' reproduces stage 0's."""
    import torch
    from transformers import get_cosine_schedule_with_warmup

    total, warmup_ratio, lr = 30, 0.085, 3e-4  # 2.55 -> floor 2, ceil 3
    warmup = int(warmup_ratio * total)
    opt = torch.optim.AdamW([torch.nn.Parameter(torch.zeros(1))], lr=lr)
    sched = get_cosine_schedule_with_warmup(opt, num_warmup_steps=warmup, num_training_steps=total)
    expected = []
    for _ in range(total):
        expected.append(opt.param_groups[0]["lr"])
        opt.step()
        sched.step()

    floor = optim.cosine_schedule_with_warmup(
        lr, warmup_ratio=warmup_ratio, total_steps=total, warmup_rounding="floor")
    got = [float(floor(i)) for i in range(total)]
    np.testing.assert_allclose(got, expected, rtol=1e-6, atol=1e-9)

    ceil = optim.cosine_schedule_with_warmup(
        lr, warmup_ratio=warmup_ratio, total_steps=total)
    assert not np.allclose([float(ceil(i)) for i in range(total)], expected), \
        "ceil and floor schedules should differ at a fractional warmup product"


def test_clip_by_module_norm_clips_groups_independently():
    grads = {"a": {"x": jnp.full((4,), 10.0)}, "b": {"y": jnp.full((4,), 0.01)}}
    tx = optim.clip_by_module_norm(1.0)
    state = tx.init(grads)
    clipped, _ = tx.update(grads, state)
    np.testing.assert_allclose(
        float(jnp.linalg.norm(clipped["a"]["x"])), 1.0, rtol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(clipped["b"]["y"]), np.asarray(grads["b"]["y"])
    )


@pytest.mark.slow
def test_grad_accumulation_matches_large_batch():
    """MultiSteps(k) over k microbatches == one step over the concatenated batch."""
    cfg = tiny_vlm_cfg()
    params = vlm.init(jax.random.key(4), cfg)
    labels = masks.stage1_labels(params)
    loss_fn = steps.stage1_loss(cfg, PAD, remat=False)

    rng = np.random.default_rng(3)
    b1, b2 = stage1_batch(rng), stage1_batch(rng)
    big = jax.tree.map(lambda a, b: jnp.concatenate([a, b]), b1, b2)

    tx_accum, _ = optim.single_group_optimizer(labels, 1e-3, total_steps=10, accum_steps=2)
    step_a = steps.make_train_step(loss_fn, tx_accum, donate=False)
    state_a = steps.init_state(params, tx_accum)
    state_a, _, _ = step_a(state_a, b1, jax.random.key(0))
    state_a, _, _ = step_a(state_a, b2, jax.random.key(0))

    tx_big, _ = optim.single_group_optimizer(labels, 1e-3, total_steps=10)
    step_b = steps.make_train_step(loss_fn, tx_big, donate=False)
    state_b = steps.init_state(params, tx_big)
    state_b, _, _ = step_b(state_b, big, jax.random.key(0))

    a = np.asarray(state_a["params"]["projector"]["fc1"]["kernel"])
    b = np.asarray(state_b["params"]["projector"]["fc1"]["kernel"])
    np.testing.assert_allclose(a, b, rtol=2e-4, atol=1e-6)


@pytest.mark.slow
def test_stage1_step_runs_on_sharded_mesh(cpu_mesh):
    """The full stage-1 train step compiles and runs with params sharded over a 4x2
    data x model mesh — the dryrun_multichip core."""
    from projectiontrainer_tpu.parallel import shard_batch, shard_params

    cfg = tiny_vlm_cfg()
    params = vlm.init(jax.random.key(5), cfg)
    params = shard_params(params, cpu_mesh)
    labels = masks.stage1_labels(params)
    tx, _ = optim.single_group_optimizer(labels, 1e-3, total_steps=10, clip_norm=5.0)
    loss_fn = steps.stage1_loss(cfg, PAD, remat=False)
    step = steps.make_train_step(loss_fn, tx, donate=False)

    rng = np.random.default_rng(5)
    batch = shard_batch(stage1_batch(rng, b=8), cpu_mesh)
    state = steps.init_state(params, tx)
    state, loss, _ = step(state, batch, jax.random.key(0))
    assert np.isfinite(float(loss))


def test_count_params_with_mask():
    cfg = tiny_vlm_cfg()
    params = vlm.init(jax.random.key(6), cfg)
    labels = masks.stage1_labels(params)
    mask = masks.bool_mask(labels)
    n_train = count_params(params, mask)
    n_total = count_params(params)
    n_proj = count_params(params["projector"])
    assert n_train == n_proj < n_total


def test_train_step_reports_trainable_grad_norm():
    """aux['grad_norm'] is the global norm of TRAINABLE grads only (the reference
    wandb.watch's the projector — Stage1/train_projection_stage1.py:359-370)."""
    import optax

    from projectiontrainer_tpu.train import steps as S

    k = jax.random.key(0)
    params = {
        "trainable": {"w": jax.random.normal(k, (4, 4))},
        "frozen": {"w": jax.random.normal(jax.random.fold_in(k, 1), (4, 4))},
    }
    mask = {"trainable": {"w": True}, "frozen": {"w": False}}

    def loss_fn(p, batch, rng):
        return jnp.sum(p["trainable"]["w"] ** 2) + jnp.sum(p["frozen"]["w"] ** 2), {}

    tx = optax.sgd(0.1)
    step = S.make_train_step(loss_fn, tx, donate=False, trainable_mask=mask)
    state = S.init_state(params, tx)
    _, _, aux = step(state, {}, jax.random.key(1))
    expected = float(jnp.linalg.norm(2 * params["trainable"]["w"]))
    np.testing.assert_allclose(float(aux["grad_norm"]), expected, rtol=1e-5)


def test_step_profiler_writes_trace(tmp_path):
    from projectiontrainer_tpu.utils.timing import StepProfiler

    prof = StepProfiler(str(tmp_path / "trace"), start_step=1, num_steps=2)
    x = jnp.ones((8, 8))
    for step in range(5):
        prof.step(step)
        x = (x @ x).block_until_ready()
    prof.close()
    import glob as g

    assert g.glob(str(tmp_path / "trace" / "**" / "*.trace*"), recursive=True) or \
        g.glob(str(tmp_path / "trace" / "**" / "*.pb"), recursive=True), \
        "no profiler artifacts written"


def test_resolve_ce_impl_explicit_fused_validates_contract():
    """Explicit ce_impl='fused' must not bypass the correctness guards: a trained
    vocab table would silently get hard-zero gradients from the kernel's zero table
    cotangent, and a misaligned hidden dim violates the kernel's lane contract."""
    S = steps
    assert S._resolve_ce_impl("chunked", table_frozen=False) == "chunked"
    with pytest.raises(ValueError, match="frozen vocab table"):
        S._resolve_ce_impl("fused", table_frozen=False, hidden_size=256)
    with pytest.raises(ValueError, match="hidden_size"):
        S._resolve_ce_impl("fused", table_frozen=True, hidden_size=72)
    assert S._resolve_ce_impl("fused", table_frozen=True, hidden_size=256) == "fused"


def test_lora_dropout_applied_in_train_only():
    """VERDICT r1 item 2: LoRA dropout must (a) change the training loss when an rng
    is supplied, (b) be disabled in eval (rng=None), and (c) reproduce the
    no-dropout values bit-for-bit at dropout=0."""
    cfg = tiny_vlm_cfg()
    lcfg_drop = lora_mod.LoraConfig(r=2, alpha=4, dropout=0.5)
    lcfg_zero = lora_mod.LoraConfig(r=2, alpha=4, dropout=0.0)
    params = vlm.init(jax.random.key(3), cfg)
    params["lora"] = lora_mod.init(jax.random.key(4), cfg.llm, lcfg_drop)
    # B inits at zero (PEFT), which makes the LoRA branch a no-op — give it signal
    # so dropout on the branch input is observable in the loss.
    params["lora"] = jax.tree.map(
        lambda x: x + 0.1 * jax.random.normal(jax.random.key(5), x.shape, x.dtype),
        params["lora"],
    )
    rng = np.random.default_rng(7)
    batch = {
        "pixel_values": jnp.asarray(rng.normal(size=(2, 16, 16, 3)).astype(np.float32)),
        "question_ids": jnp.asarray(rng.integers(1, 64, size=(2, 4))),
        "answer_ids": jnp.asarray(rng.integers(1, 64, size=(2, 6))),
    }

    loss_drop = steps.stage2_loss(cfg, PAD, lora_cfg=lcfg_drop, remat=False)
    loss_zero = steps.stage2_loss(cfg, PAD, lora_cfg=lcfg_zero, remat=False)

    base = float(loss_drop(params, batch, None)[0])           # eval: no dropout
    trained = float(loss_drop(params, batch, jax.random.key(0))[0])
    trained2 = float(loss_drop(params, batch, jax.random.key(1))[0])
    assert trained != base, "dropout did not change the training loss"
    assert trained != trained2, "dropout is not rng-dependent"
    # eval determinism: same params, rng=None -> identical
    assert float(loss_drop(params, batch, None)[0]) == base
    # dropout=0 with an rng is bit-for-bit the no-dropout path
    assert float(loss_zero(params, batch, jax.random.key(0))[0]) == base


def test_watch_subtree_returns_projector_grads(tmp_path):
    """watch_subtree='projector' exposes the raw projector gradient pytree in aux,
    and MetricLogger.log_gradient_stats writes per-parameter norms (the wandb.watch
    equivalent — reference Stage1/train_projection_stage1.py:359-370)."""
    import json as _json

    import optax

    from projectiontrainer_tpu.utils.logging import MetricLogger

    k = jax.random.key(0)
    params = {
        "projector": {"fc1": {"kernel": jax.random.normal(k, (4, 4))}},
        "llm": {"w": jax.random.normal(jax.random.fold_in(k, 1), (4, 4))},
    }
    mask = {"projector": {"fc1": {"kernel": True}}, "llm": {"w": False}}

    def loss_fn(p, batch, rng):
        return jnp.sum(p["projector"]["fc1"]["kernel"] ** 2) + jnp.sum(p["llm"]["w"] ** 2), {}

    tx = optax.sgd(0.1)
    step = steps.make_train_step(loss_fn, tx, donate=False, trainable_mask=mask,
                                 watch_subtree="projector")
    state = steps.init_state(params, tx)
    _, _, aux = step(state, {}, jax.random.key(1))
    expected = np.asarray(2 * params["projector"]["fc1"]["kernel"])
    np.testing.assert_allclose(np.asarray(aux["watched_grads"]["fc1"]["kernel"]),
                               expected, rtol=1e-6)

    logger = MetricLogger(str(tmp_path))
    logger.log_gradient_stats(aux["watched_grads"], step=1, prefix="gradients/projector")
    logger.close()
    rows = [_json.loads(l) for l in open(tmp_path / "metrics.jsonl")]
    keys = set().union(*(r.keys() for r in rows))
    assert "gradients/projector/fc1/kernel.norm" in keys
    assert "gradients/projector/fc1/kernel.std" in keys


def test_partial_remat_matches_plain_forward_and_grads():
    """siglip.vision_forward remat=k (checkpoint only the first k layers) is a pure
    memory knob: loss and gradients are bit-identical to the no-remat path."""
    cfg = siglip.SiglipConfig(
        vision=siglip.VisionConfig(hidden_size=16, intermediate_size=32, num_layers=3,
                                   num_heads=2, image_size=16, patch_size=8),
        text=siglip.TextConfig(hidden_size=16, intermediate_size=32, num_layers=2,
                               num_heads=2, vocab_size=50, max_position_embeddings=8),
    )
    params = siglip.init(jax.random.key(5), cfg)
    rng = np.random.default_rng(6)
    batch = {
        "pixel_values": jnp.asarray(rng.normal(size=(2, 16, 16, 3)).astype(np.float32)),
        "input_ids": jnp.asarray(rng.integers(0, 50, size=(2, 8))),
    }

    def run(remat):
        loss_fn = steps.stage0_loss(cfg, remat=remat)
        val, grads = jax.value_and_grad(lambda p: loss_fn(p, batch, None)[0])(params)
        return float(val), grads

    v_plain, g_plain = run(False)
    for remat in (2, True):
        v_r, g_r = run(remat)
        assert v_r == v_plain
        for a, b in zip(jax.tree.leaves(g_r), jax.tree.leaves(g_plain)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_decoder_partial_remat_matches_plain():
    """stage2_loss remat=<int N> (checkpoint only the first N DECODER layers — the
    8B memory/speed dial) is numerics-neutral: loss and grads bit-equal to
    remat=False and remat=True."""
    from projectiontrainer_tpu import testing as T

    cfg = T.tiny_vlm_cfg(llm_layers=3)
    params = vlm.init(jax.random.key(9), cfg)
    rng = np.random.default_rng(9)
    batch = {
        "pixel_values": jnp.asarray(rng.normal(size=(2, 32, 32, 3)).astype(np.float32)),
        "question_ids": jnp.asarray(rng.integers(1, cfg.llm.vocab_size, size=(2, 6))),
        "answer_ids": jnp.asarray(rng.integers(1, cfg.llm.vocab_size, size=(2, 8))),
    }

    def run(remat):
        loss_fn = steps.stage2_loss(cfg, 0, remat=remat, table_frozen=False)
        val, grads = jax.value_and_grad(lambda p: loss_fn(p, batch, None)[0])(params)
        return float(val), grads

    v_plain, g_plain = run(False)
    for remat in (1, 2, True):
        v_r, g_r = run(remat)
        assert v_r == v_plain, f"remat={remat}"
        # recompute reassociates float ops (XLA fuses the recomputed fwd
        # differently), so grads are allclose rather than bitwise
        for a, b in zip(jax.tree.leaves(g_r), jax.tree.leaves(g_plain)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=5e-3, atol=1e-5)


def test_swap_optimizer_carries_surviving_group_moments():
    """swap_optimizer (the 1EpochUnfreeze / --train_ve_first_epoch epoch boundary)
    keeps the surviving groups' Adam mu/nu and bias-correction counts and drops the
    newly frozen group's slots — the reference keeps ONE AdamW across the
    requires_grad flip (cls_evaluate/train_utils.py:286-308, Stage2/trainer.py:267-289)
    so head/LoRA moments must persist through the swap."""
    params = {"vision": {"w": jnp.ones((4, 4))}, "probe": {"w": jnp.ones((3,))}}
    mk = lambda frozen: optim.discriminative_optimizer(
        masks.classifier_labels(params, freeze_vision=frozen),
        head_lr=1e-2, backbone_lr=1e-3, total_steps=10)[0]
    tx_unfrozen, tx_frozen = mk(False), mk(True)

    def loss_fn(p, batch, rng):
        return sum(jnp.sum(leaf ** 2) for leaf in jax.tree.leaves(p)), {}

    step = steps.make_train_step(
        loss_fn, tx_unfrozen, donate=False,
        trainable_mask=masks.bool_mask(masks.classifier_labels(params, freeze_vision=False)),
    )
    state = steps.init_state(params, tx_unfrozen)
    for _ in range(3):
        state, _, _ = step(state, {}, None)

    swapped = steps.swap_optimizer(state, tx_frozen)
    assert int(swapped["step"]) == int(state["step"])
    keystr = jax.tree_util.keystr
    old = {keystr(p): l for p, l in
           jax.tree_util.tree_leaves_with_path(state["opt_state"])}
    new = {keystr(p): l for p, l in
           jax.tree_util.tree_leaves_with_path(swapped["opt_state"])}
    carried = [k for k in new if k in old]
    # every carried path holds the OLD value bit-for-bit (moments + counts persist)
    for k in carried:
        np.testing.assert_array_equal(np.asarray(new[k]), np.asarray(old[k]))
    # the carried state is non-trivial: the head group actually trained, so at least
    # one carried moment tensor is nonzero (a fresh init would be all zeros)
    assert any(np.asarray(new[k]).size > 1 and np.any(np.asarray(new[k]) != 0)
               for k in carried)
    # the newly frozen backbone's moment slots are dropped from the new state
    assert any(k not in new for k in old)

    # fresh-init contrast: without the carry, every moment restarts at zero
    fresh = steps.init_state(state["params"], tx_frozen)["opt_state"]
    fresh_leaves = {keystr(p): l for p, l in jax.tree_util.tree_leaves_with_path(fresh)}
    assert any(
        np.any(np.asarray(fresh_leaves[k]) != np.asarray(new[k])) for k in carried
    ), "swap_optimizer should differ from a fresh init after training steps"


def test_left_align_padding_puts_pads_first():
    """Generation prefixes are LEFT-padded: the last slot of a short question must be
    a real token, not a pad embedding (advisor r4: np.argsort(ids == pad) RIGHT-pads;
    reference forces padding_side='left' — Stage2/trainer.py:499-505)."""
    from projectiontrainer_tpu.train import common

    pad = 0
    ids = np.array([
        [5, 7, 9, pad, pad],   # short question, right-padded as batched
        [1, 2, 3, 4, 6],       # full-length question
        [pad, pad, pad, 8, 3],  # already left-padded: unchanged
    ])
    out = common.left_align_padding(ids, pad)
    np.testing.assert_array_equal(out[0], [pad, pad, 5, 7, 9])
    np.testing.assert_array_equal(out[1], [1, 2, 3, 4, 6])
    np.testing.assert_array_equal(out[2], [pad, pad, pad, 8, 3])
    # invariant: for every row with at least one real token, the LAST slot is real
    assert np.all(out[:, -1] != pad)
    # relative order of real tokens preserved (stable sort)
    for row_in, row_out in zip(ids, out):
        assert list(row_in[row_in != pad]) == list(row_out[row_out != pad])
