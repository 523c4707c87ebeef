"""Loss parity vs torch implementations replicating the reference's exact formulas."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from projectiontrainer_tpu.train import losses


def test_shifted_clm_loss_matches_torch_ce():
    rng = np.random.default_rng(0)
    b, t, v = 3, 12, 37
    logits = rng.normal(size=(b, t, v)).astype(np.float32)
    labels = rng.integers(0, v, size=(b, t))
    labels[0, :5] = -100
    labels[2, 8:] = -100

    # torch reference: the Stage-2 manual loss (Stage2/trainer.py:407-418)
    tl = torch.tensor(logits)[:, :-1, :].reshape(-1, v)
    tt = torch.tensor(labels)[:, 1:].reshape(-1)
    expected = torch.nn.CrossEntropyLoss()(tl, tt).item()

    loss, count = losses.shifted_clm_loss(jnp.asarray(logits), jnp.asarray(labels))
    np.testing.assert_allclose(float(loss), expected, rtol=1e-5)
    assert int(count) == int((tt != -100).sum())


def test_shifted_clm_loss_all_masked_is_finite():
    logits = jnp.zeros((1, 4, 7))
    labels = jnp.full((1, 4), -100)
    loss, count = losses.shifted_clm_loss(logits, labels)
    assert np.isfinite(float(loss)) and float(loss) == 0.0 and int(count) == 0


def test_siglip_pairwise_loss_matches_reference_formula():
    rng = np.random.default_rng(1)
    n, d = 6, 16
    img = rng.normal(size=(n, d)).astype(np.float32)
    txt = rng.normal(size=(n, d)).astype(np.float32)
    scale = np.float32(1.3)

    # torch replication of Stage0/train_vision_encoder_stage0.py:260-269
    ti = F.normalize(torch.tensor(img), p=2, dim=1)
    tt = F.normalize(torch.tensor(txt), p=2, dim=1)
    logits = ti @ tt.t() * torch.tensor(scale).exp()
    expected = (
        F.binary_cross_entropy_with_logits(logits, torch.eye(n), reduction="sum") / n
    ).item()

    ours = losses.siglip_pairwise_loss(jnp.asarray(img), jnp.asarray(txt), scale)
    np.testing.assert_allclose(float(ours), expected, rtol=1e-5)


def test_siglip_pairwise_loss_with_bias():
    rng = np.random.default_rng(2)
    img = rng.normal(size=(4, 8)).astype(np.float32)
    txt = rng.normal(size=(4, 8)).astype(np.float32)
    ti = F.normalize(torch.tensor(img), p=2, dim=1)
    tt = F.normalize(torch.tensor(txt), p=2, dim=1)
    logits = ti @ tt.t() * torch.tensor(0.5).exp() - 3.0
    expected = (
        F.binary_cross_entropy_with_logits(logits, torch.eye(4), reduction="sum") / 4
    ).item()
    ours = losses.siglip_pairwise_loss(
        jnp.asarray(img), jnp.asarray(txt), np.float32(0.5), logit_bias=np.float32(-3.0)
    )
    np.testing.assert_allclose(float(ours), expected, rtol=1e-5)


def _torch_two_way(logits, targets, t_p=4.0, t_n=1.0):
    """Direct loop replication of cls_evaluate/train_twoway_loss.py:166-286."""
    logits = torch.tensor(logits)
    targets = torch.tensor(targets)

    def single(lg, lb):
        pos, neg = lb == 1, lb == 0
        if not pos.any() or not neg.any():
            return torch.tensor(0.0)
        lse_n = t_n * torch.logsumexp(lg[neg] / t_n, dim=0)
        lse_p = t_p * torch.logsumexp(-lg[pos] / t_p, dim=0)
        return F.softplus(lse_n + lse_p)

    b, c = logits.shape
    s = torch.stack([single(logits[i], targets[i]) for i in range(b)]).mean()
    cl = torch.stack([single(logits[:, j], targets[:, j]) for j in range(c)]).mean()
    return ((s + cl) / 2).item()


def test_two_way_loss_matches_reference():
    rng = np.random.default_rng(3)
    logits = rng.normal(size=(5, 4)).astype(np.float32) * 3
    targets = rng.integers(0, 2, size=(5, 4)).astype(np.float32)
    targets[0] = 1  # a row without negatives -> zero contribution
    targets[:, 2] = 0  # a column without positives -> zero contribution
    expected = _torch_two_way(logits, targets)
    ours = losses.two_way_multilabel_loss(jnp.asarray(logits), jnp.asarray(targets))
    np.testing.assert_allclose(float(ours), expected, rtol=1e-5, atol=1e-6)


def test_softmax_ce_matches_torch():
    rng = np.random.default_rng(4)
    logits = rng.normal(size=(6, 5)).astype(np.float32)
    targets = rng.integers(0, 5, size=(6,))
    expected = torch.nn.CrossEntropyLoss()(torch.tensor(logits), torch.tensor(targets)).item()
    ours = losses.softmax_ce_loss(jnp.asarray(logits), jnp.asarray(targets))
    np.testing.assert_allclose(float(ours), expected, rtol=1e-5)


def test_chunked_clm_loss_matches_unchunked():
    import jax

    rng = np.random.default_rng(5)
    b, t, d, v = 2, 11, 8, 23
    hidden = jnp.asarray(rng.normal(size=(b, t, d)).astype(np.float32))
    table = jnp.asarray(rng.normal(size=(v, d)).astype(np.float32))
    labels = jnp.asarray(rng.integers(0, v, size=(b, t)))
    labels = labels.at[0, :3].set(-100)

    logits = jnp.einsum("btd,vd->btv", hidden, table)
    ref_loss, ref_count = losses.shifted_clm_loss(logits, labels)
    for chunk in (3, 4, 16):
        loss, count = losses.chunked_shifted_clm_loss(
            hidden, table, labels, chunk_size=chunk
        )
        np.testing.assert_allclose(float(loss), float(ref_loss), rtol=1e-5)
        assert int(count) == int(ref_count)

    # gradients agree too (the checkpointed scan must backprop correctly)
    def f_ref(h):
        return losses.shifted_clm_loss(jnp.einsum("btd,vd->btv", h, table), labels)[0]

    def f_chunk(h):
        return losses.chunked_shifted_clm_loss(h, table, labels, chunk_size=4)[0]

    g_ref = jax.grad(f_ref)(hidden)
    g_chunk = jax.grad(f_chunk)(hidden)
    np.testing.assert_allclose(np.asarray(g_chunk), np.asarray(g_ref), rtol=1e-4, atol=1e-6)


def test_stop_gradient_mask_freezes_in_step():
    """make_train_step's trainable_mask must stop grads for frozen leaves."""
    import jax
    import optax

    from projectiontrainer_tpu.train import steps as S

    params = {"a": jnp.ones((3,)), "b": jnp.ones((3,))}

    def loss_fn(p, batch, rng):
        return jnp.sum((p["a"] * p["b"] - batch) ** 2), {}

    tx = optax.sgd(0.1)
    step = S.make_train_step(loss_fn, tx, donate=False,
                             trainable_mask={"a": True, "b": False})
    state = S.init_state(params, tx)
    state, _, _ = step(state, jnp.zeros((3,)), jax.random.key(0))
    assert not np.allclose(np.asarray(state["params"]["a"]), 1.0)
    np.testing.assert_array_equal(np.asarray(state["params"]["b"]), 1.0)


@pytest.mark.slow
def test_stage0_local_negatives_matches_per_shard_reference():
    """local_negatives_shards=N == mean of per-shard reference losses (DDP semantics)."""
    import jax

    from projectiontrainer_tpu.models import siglip
    from projectiontrainer_tpu.train import steps as S

    cfg = siglip.SiglipConfig(
        vision=siglip.VisionConfig(hidden_size=16, intermediate_size=32, num_layers=1,
                                   num_heads=2, image_size=16, patch_size=8),
        text=siglip.TextConfig(hidden_size=16, intermediate_size=32, num_layers=1,
                               num_heads=2, vocab_size=31, max_position_embeddings=6),
    )
    params = siglip.init(jax.random.key(0), cfg)
    rng = np.random.default_rng(0)
    batch = {
        "pixel_values": jnp.asarray(rng.normal(size=(8, 16, 16, 3)).astype(np.float32)),
        "input_ids": jnp.asarray(rng.integers(0, 31, size=(8, 6))),
    }
    sharded, _ = S.stage0_loss(cfg, local_negatives_shards=4)(params, batch, None)
    expected = []
    for i in range(4):
        sub = {k: v[i * 2:(i + 1) * 2] for k, v in batch.items()}
        l, _ = S.stage0_loss(cfg)(params, sub, None)
        expected.append(float(l))
    np.testing.assert_allclose(float(sharded), np.mean(expected), rtol=1e-5)


def test_weighted_clm_loss_matches_real_subset():
    """sample_weight 0 rows (straggler-batch fillers) must not move the loss: the
    weighted full-batch loss equals the unweighted loss over the real rows only."""
    rng = np.random.default_rng(11)
    b, t, v = 4, 9, 23
    logits = jnp.asarray(rng.normal(size=(b, t, v)).astype(np.float32))
    labels = rng.integers(0, v, size=(b, t))
    labels[:, :3] = -100
    labels = jnp.asarray(labels)
    w = jnp.asarray([1.0, 1.0, 0.0, 0.0])

    weighted, n_tok = losses.shifted_clm_loss(logits, labels, sample_weights=w)
    subset, n_sub = losses.shifted_clm_loss(logits[:2], labels[:2])
    np.testing.assert_allclose(float(weighted), float(subset), rtol=1e-6)
    assert int(n_tok) == int(n_sub)

    # chunked variant agrees too
    d = 8
    hidden = jnp.asarray(rng.normal(size=(b, t, d)).astype(np.float32))
    table = jnp.asarray(rng.normal(size=(v, d)).astype(np.float32))
    cw, cn = losses.chunked_shifted_clm_loss(
        hidden, table, labels, chunk_size=4, sample_weights=w
    )
    cs, _ = losses.chunked_shifted_clm_loss(hidden[:2], table, labels[:2], chunk_size=4)
    np.testing.assert_allclose(float(cw), float(cs), rtol=1e-5)
    assert int(cn) == int(n_sub)


def test_weighted_softmax_ce_matches_real_subset():
    rng = np.random.default_rng(12)
    logits = jnp.asarray(rng.normal(size=(5, 7)).astype(np.float32))
    targets = jnp.asarray(rng.integers(0, 7, size=(5,)))
    w = jnp.asarray([1.0, 1.0, 1.0, 0.0, 0.0])
    weighted = losses.softmax_ce_loss(logits, targets, sample_weights=w)
    subset = losses.softmax_ce_loss(logits[:3], targets[:3])
    np.testing.assert_allclose(float(weighted), float(subset), rtol=1e-6)


def test_weighted_siglip_pairwise_matches_real_subset():
    """Straggler-batch fillers (weight 0) must vanish from the pairwise matrix: the
    weighted loss over the padded batch equals the unweighted loss over the real
    rows alone — the reference's genuinely smaller final DDP batch (a filler
    duplicating a real row would otherwise be a false negative with a logit equal
    to the true positive's)."""
    rng = np.random.default_rng(0)
    n_real, n_pad = 5, 3
    img = rng.normal(size=(n_real, 8)).astype(np.float32)
    txt = rng.normal(size=(n_real, 8)).astype(np.float32)
    # fillers duplicate real rows, like fixed_batcher/global_bucket_plan
    imgp = np.concatenate([img, img[:n_pad]])
    txtp = np.concatenate([txt, txt[:n_pad]])
    w = np.concatenate([np.ones(n_real), np.zeros(n_pad)]).astype(np.float32)

    ref = losses.siglip_pairwise_loss(jnp.asarray(img), jnp.asarray(txt), 0.7, 0.1)
    got = losses.siglip_pairwise_loss(jnp.asarray(imgp), jnp.asarray(txtp), 0.7, 0.1,
                                      sample_weight=jnp.asarray(w))
    np.testing.assert_allclose(float(got), float(ref), rtol=1e-6)
    # and the unweighted padded loss is genuinely different (the bug this guards)
    bad = losses.siglip_pairwise_loss(jnp.asarray(imgp), jnp.asarray(txtp), 0.7, 0.1)
    assert abs(float(bad) - float(ref)) > 1e-3


def test_weighted_two_way_loss_matches_real_subset():
    """Filler rows must be excluded from BOTH directions of the two-way loss: the
    sample-wise mean and every class's over-the-batch logsumexp."""
    rng = np.random.default_rng(1)
    n_real, n_pad, ncls = 6, 2, 4
    logits = rng.normal(size=(n_real, ncls)).astype(np.float32)
    targets = rng.integers(0, 2, size=(n_real, ncls))
    logitsp = np.concatenate([logits, logits[:n_pad]])
    targetsp = np.concatenate([targets, targets[:n_pad]])
    w = np.concatenate([np.ones(n_real), np.zeros(n_pad)]).astype(np.float32)

    ref = losses.two_way_multilabel_loss(jnp.asarray(logits), jnp.asarray(targets))
    got = losses.two_way_multilabel_loss(jnp.asarray(logitsp), jnp.asarray(targetsp),
                                         sample_weights=jnp.asarray(w))
    np.testing.assert_allclose(float(got), float(ref), rtol=1e-6)
    bad = losses.two_way_multilabel_loss(jnp.asarray(logitsp), jnp.asarray(targetsp))
    assert abs(float(bad) - float(ref)) > 1e-4
