"""Generation tests: greedy decode matches HF generate on a tiny Gemma3; cache decode is
consistent with full-sequence forward; beam/sampling smoke tests with left-padded prefixes."""

import numpy as np
import torch
import pytest

import jax
import jax.numpy as jnp

from projectiontrainer_tpu.generate import GenerationConfig, generate
from projectiontrainer_tpu.models import decoder as dec

pytestmark = pytest.mark.slow  # torch/HF parity fixtures dominate the suite runtime


def _tiny_hf_lm(layers=4, hidden=48, vocab=101):
    from transformers import Gemma3TextConfig
    from transformers.models.gemma3.modeling_gemma3 import Gemma3ForCausalLM

    cfg = Gemma3TextConfig(
        vocab_size=vocab, hidden_size=hidden, intermediate_size=hidden * 4,
        num_hidden_layers=layers, num_attention_heads=4, num_key_value_heads=2,
        head_dim=12, sliding_window=8, query_pre_attn_scalar=12,
        max_position_embeddings=256, attn_implementation="eager",
    )
    torch.manual_seed(7)
    model = Gemma3ForCausalLM(cfg).eval()
    jcfg = dec.from_hf_config(cfg)
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    params = dec.params_from_hf_state_dict(jcfg, sd)
    return cfg, model, jcfg, params


def test_greedy_matches_hf_generate():
    hf_cfg, model, jcfg, params = _tiny_hf_lm()
    rng = np.random.default_rng(0)
    ids = rng.integers(1, hf_cfg.vocab_size, size=(2, 7))
    max_new = 8

    with torch.no_grad():
        hf_out = model.generate(
            input_ids=torch.tensor(ids), attention_mask=torch.ones(ids.shape, dtype=torch.long),
            max_new_tokens=max_new, do_sample=False, num_beams=1,
            pad_token_id=0, eos_token_id=None, use_cache=True,
        )[:, ids.shape[1]:].numpy()

    embeds = dec.embed(params, jcfg, jnp.asarray(ids))
    ours = generate(
        params, jcfg, embeds, jnp.ones(ids.shape, jnp.int32),
        GenerationConfig(max_new_tokens=max_new, do_sample=False, pad_token_id=0),
    )
    np.testing.assert_array_equal(np.asarray(ours), hf_out)


def test_greedy_matches_hf_generate_left_padded():
    hf_cfg, model, jcfg, params = _tiny_hf_lm()
    rng = np.random.default_rng(1)
    ids = rng.integers(1, hf_cfg.vocab_size, size=(2, 9))
    attn = np.ones((2, 9), np.int64)
    ids[0, :4] = 0
    attn[0, :4] = 0
    max_new = 6

    with torch.no_grad():
        hf_out = model.generate(
            input_ids=torch.tensor(ids), attention_mask=torch.tensor(attn),
            max_new_tokens=max_new, do_sample=False, num_beams=1,
            pad_token_id=0, eos_token_id=None, use_cache=True,
        )[:, ids.shape[1]:].numpy()

    embeds = dec.embed(params, jcfg, jnp.asarray(ids))
    ours = generate(
        params, jcfg, embeds, jnp.asarray(attn),
        GenerationConfig(max_new_tokens=max_new, do_sample=False, pad_token_id=0),
    )
    np.testing.assert_array_equal(np.asarray(ours), hf_out)


def test_cache_decode_consistent_with_full_forward():
    """Greedy decode step-by-step equals argmax over a full no-cache forward."""
    _, _, jcfg, params = _tiny_hf_lm()
    rng = np.random.default_rng(2)
    ids = rng.integers(1, 101, size=(1, 5))
    max_new = 5

    embeds = dec.embed(params, jcfg, jnp.asarray(ids))
    ours = np.asarray(generate(
        params, jcfg, embeds, jnp.ones(ids.shape, jnp.int32),
        GenerationConfig(max_new_tokens=max_new, do_sample=False, pad_token_id=0),
    ))

    seq = list(ids[0])
    for _ in range(max_new):
        hidden, _ = dec.forward(params, jcfg, input_ids=jnp.asarray([seq]))
        logit = dec.logits(params, jcfg, hidden[:, -1:, :])
        seq.append(int(jnp.argmax(logit[0, 0])))
    np.testing.assert_array_equal(ours[0], np.asarray(seq[ids.shape[1]:]))


def test_beam_matches_hf_beam_search():
    hf_cfg, model, jcfg, params = _tiny_hf_lm()
    rng = np.random.default_rng(3)
    ids = rng.integers(1, hf_cfg.vocab_size, size=(2, 6))
    max_new = 5

    with torch.no_grad():
        hf_out = model.generate(
            input_ids=torch.tensor(ids), attention_mask=torch.ones(ids.shape, dtype=torch.long),
            max_new_tokens=max_new, min_new_tokens=max_new, do_sample=False, num_beams=3,
            pad_token_id=0, eos_token_id=None, length_penalty=1.0,
            early_stopping=False, use_cache=True,
        )[:, ids.shape[1]:].numpy()

    embeds = dec.embed(params, jcfg, jnp.asarray(ids))
    ours = generate(
        params, jcfg, embeds, jnp.ones(ids.shape, jnp.int32),
        GenerationConfig(max_new_tokens=max_new, do_sample=False, num_beams=3,
                         pad_token_id=0, length_penalty=1.0),
    )
    np.testing.assert_array_equal(np.asarray(ours), hf_out)


def _pad_hf_rows(hf_out, max_new, pad_id=0):
    """HF generate returns ragged-finalized rows padded to the batch max; normalize to
    [B, max_new] with pad after EOS for comparison with our static-shape output."""
    out = np.full((hf_out.shape[0], max_new), pad_id, hf_out.dtype)
    out[:, : hf_out.shape[1]] = hf_out[:, :max_new]
    return out


def test_beam_with_eos_and_penalties_matches_hf():
    """Deterministic beam search with the reference inference penalty set
    (repetition_penalty=1.8, length_penalty=1.2 — Stage2/run_vqa_inference_stage2.sh:18-25)
    and EOS termination matches HF token-for-token.

    HF is driven from ``inputs_embeds`` like the reference's VLM decode
    (Stage2/inference_vqa_stage2.py:182-196): with an embedding prefix there are no prompt
    ids, so the repetition penalty sees only generated tokens on both sides."""
    hf_cfg, model, jcfg, params = _tiny_hf_lm()
    rng = np.random.default_rng(5)
    ids = rng.integers(1, hf_cfg.vocab_size, size=(2, 6))
    max_new = 10
    attn = torch.ones(ids.shape, dtype=torch.long)
    with torch.no_grad():
        hf_embeds = model.get_input_embeddings()(torch.tensor(ids))  # HF scales internally

    def hf_generate(eos):
        with torch.no_grad():
            return model.generate(
                inputs_embeds=hf_embeds, attention_mask=attn,
                max_new_tokens=max_new, do_sample=False, num_beams=3, pad_token_id=0,
                eos_token_id=eos, repetition_penalty=1.8, length_penalty=1.2,
                early_stopping=False, use_cache=True,
            ).numpy()

    # pick an eos id HF generates mid-sequence so the finished-hypothesis path is exercised
    probe = hf_generate(None)
    eos = int(probe[0, max_new // 2])
    hf_out = hf_generate(eos)
    assert not np.array_equal(hf_out, probe)  # eos handling changed the search

    embeds = dec.embed(params, jcfg, jnp.asarray(ids))
    ours = np.asarray(generate(
        params, jcfg, embeds, jnp.ones(ids.shape, jnp.int32),
        GenerationConfig(max_new_tokens=max_new, do_sample=False, num_beams=3,
                         repetition_penalty=1.8, length_penalty=1.2,
                         eos_token_id=eos, pad_token_id=0),
    ))
    np.testing.assert_array_equal(ours, _pad_hf_rows(hf_out, max_new))


def test_beam_reorder_optimized_matches_naive():
    """The prefix-skipping KV-cache reorder (+ identity-skip cond) is bit-identical to
    gathering the whole cache every step."""
    from projectiontrainer_tpu.generate import decode

    _, _, jcfg, params = _tiny_hf_lm()
    rng = np.random.default_rng(6)
    ids = rng.integers(1, 101, size=(2, 5))
    embeds = dec.embed(params, jcfg, jnp.asarray(ids))
    mask = jnp.ones(ids.shape, jnp.int32)
    cfg = GenerationConfig(max_new_tokens=8, do_sample=True, num_beams=3,
                           temperature=0.9, top_k=40, top_p=0.95,
                           repetition_penalty=1.8, length_penalty=1.2,
                           eos_token_id=5, pad_token_id=0)
    key = jax.random.key(11)
    fast = decode._generate_beam(params, jcfg, embeds, mask, cfg, key)
    naive = decode._generate_beam(params, jcfg, embeds, mask, cfg, key, naive_reorder=True)
    np.testing.assert_array_equal(np.asarray(fast), np.asarray(naive))


def test_beam_sampling_is_stochastic_and_honors_flags():
    """do_sample with num_beams>1 (the reference's default eval config —
    Stage2/trainer.py:604-614) must actually change the decode path: different keys give
    different outputs, the same key reproduces, and temperature→0 collapses the noise."""
    _, _, jcfg, params = _tiny_hf_lm()
    rng = np.random.default_rng(7)
    ids = rng.integers(1, 101, size=(2, 5))
    embeds = dec.embed(params, jcfg, jnp.asarray(ids))
    mask = jnp.ones(ids.shape, jnp.int32)

    def run(key, temperature=1.5, do_sample=True):
        return np.asarray(generate(
            params, jcfg, embeds, mask,
            GenerationConfig(max_new_tokens=8, do_sample=do_sample, num_beams=3,
                             temperature=temperature, top_k=50, top_p=0.9,
                             pad_token_id=0),
            key=jax.random.key(key),
        ))

    a, b, c = run(0), run(1), run(0)
    np.testing.assert_array_equal(a, c)            # deterministic given the key
    assert not np.array_equal(a, b)                # stochastic across keys
    assert not np.array_equal(a, run(0, do_sample=False))  # do_sample changes the path
    # near-zero temperature: gumbel noise is negligible next to logp/T — keys agree
    np.testing.assert_array_equal(run(2, temperature=1e-4), run(3, temperature=1e-4))


def test_eos_padding_and_sampling_shapes():
    _, _, jcfg, params = _tiny_hf_lm()
    rng = np.random.default_rng(4)
    ids = rng.integers(1, 101, size=(2, 4))
    embeds = dec.embed(params, jcfg, jnp.asarray(ids))
    cfg = GenerationConfig(
        max_new_tokens=10, do_sample=True, temperature=0.7, top_k=20, top_p=0.9,
        repetition_penalty=1.8, eos_token_id=5, pad_token_id=0,
    )
    out = np.asarray(generate(params, jcfg, embeds, jnp.ones(ids.shape, jnp.int32), cfg,
                              key=jax.random.key(0)))
    assert out.shape == (2, 10)
    # after an EOS, everything must be pad
    for row in out:
        eos_pos = np.where(row == 5)[0]
        if len(eos_pos):
            assert (row[eos_pos[0] + 1:] == 0).all()


def test_beam_sampling_approx_topk_path():
    """approx_top_k=True (opt-in approx_max_k candidate scan — decode.py) must produce
    valid, key-deterministic output and collapse to the same argmax choices as the
    exact path at near-zero temperature (where only the clear top candidate matters,
    which approx top-k cannot miss)."""
    _, _, jcfg, params = _tiny_hf_lm()
    rng = np.random.default_rng(11)
    ids = rng.integers(1, 101, size=(2, 5))
    embeds = dec.embed(params, jcfg, jnp.asarray(ids))
    mask = jnp.ones(ids.shape, jnp.int32)

    def run(key, approx, temperature):
        return np.asarray(generate(
            params, jcfg, embeds, mask,
            GenerationConfig(max_new_tokens=8, do_sample=True, num_beams=3,
                             temperature=temperature, top_k=20, top_p=0.9,
                             approx_top_k=approx, pad_token_id=0),
            key=jax.random.key(key),
        ))

    a, b = run(0, True, 1.5), run(0, True, 1.5)
    np.testing.assert_array_equal(a, b)  # deterministic given the key
    assert a.shape == (2, 8)
    assert (a >= 0).all() and (a < jcfg.vocab_size).all()
    # near-zero temperature: exact and approx agree on the dominant candidates
    np.testing.assert_array_equal(run(5, True, 1e-4), run(6, False, 1e-4))


def test_beam_early_stopping_matches_hf_and_cuts_steps():
    """HF's early_stopping=False heuristic (worst-finished vs best-possible-live,
    `_check_early_stop_heuristic`) is implemented inside the decode loop: outputs
    must stay token-for-token HF-identical AND the loop must halt before
    max_new_tokens when every batch's heuristic is satisfied (VERDICT r1 item 7)."""
    from projectiontrainer_tpu.generate import decode

    hf_cfg, model, jcfg, params = _tiny_hf_lm()
    rng = np.random.default_rng(11)
    ids = rng.integers(1, hf_cfg.vocab_size, size=(2, 6))
    max_new = 24
    attn = torch.ones(ids.shape, dtype=torch.long)
    with torch.no_grad():
        hf_embeds = model.get_input_embeddings()(torch.tensor(ids))

    def hf_generate(eos, lp):
        with torch.no_grad():
            return model.generate(
                inputs_embeds=hf_embeds, attention_mask=attn,
                max_new_tokens=max_new, do_sample=False, num_beams=3, pad_token_id=0,
                eos_token_id=eos, length_penalty=lp, early_stopping=False,
                use_cache=True,
            ).numpy()

    # eos = a token HF emits early so hypotheses finish fast and the heuristic fires
    probe = hf_generate(None, 1.0)
    embeds = dec.embed(params, jcfg, jnp.asarray(ids))
    mask = jnp.ones(ids.shape, jnp.int32)
    stopped_early = False
    for lp in (1.0, 1.2, 2.0):
        for eos_pos in (1, 2, 3):
            eos = int(probe[0, eos_pos])
            hf_out = hf_generate(eos, lp)
            ours, steps = decode._generate_beam(
                params, jcfg, embeds, mask,
                GenerationConfig(max_new_tokens=max_new, do_sample=False, num_beams=3,
                                 length_penalty=lp, eos_token_id=eos, pad_token_id=0),
                jax.random.key(0), with_stats=True,
            )

            def upto_eos(arr):
                # HF fills its output buffer with `pad_token_id or eos` — with pad=0
                # (falsy!) the fill is EOS, so tokens past the first EOS are buffer
                # fill, not content. Compare content up to and incl. the first EOS.
                arr = np.asarray(arr).copy()
                for r in arr:
                    hits = np.flatnonzero(r == eos)
                    if hits.size:
                        r[hits[0] + 1:] = 0
                return arr

            np.testing.assert_array_equal(
                upto_eos(ours), upto_eos(_pad_hf_rows(hf_out, max_new)),
                err_msg=f"lp={lp} eos_pos={eos_pos}",
            )
            stopped_early |= int(steps) < max_new
    del stopped_early  # flat random models rarely trigger the heuristic — see below

    # --- a scenario where the heuristic MUST fire: a strongly-likely EOS makes
    # hypotheses finish fast with high per-token scores, so the best possible live
    # continuation drops below the worst finished hypothesis within a few steps.
    eos = 40
    with torch.no_grad():
        emb_w = model.get_input_embeddings().weight  # tied lm head
        emb_w.data[eos] += 4.0 * emb_w.data.std() * torch.sign(emb_w.data.mean(0))
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    hot_params = dec.params_from_hf_state_dict(jcfg, sd)
    with torch.no_grad():
        hf_hot = model.generate(
            inputs_embeds=model.get_input_embeddings()(torch.tensor(ids)),
            attention_mask=attn, max_new_tokens=max_new, do_sample=False,
            num_beams=3, pad_token_id=0, eos_token_id=eos, length_penalty=1.0,
            early_stopping=False, use_cache=True,
        ).numpy()
    hot_embeds = dec.embed(hot_params, jcfg, jnp.asarray(ids))
    ours, steps = decode._generate_beam(
        hot_params, jcfg, hot_embeds, mask,
        GenerationConfig(max_new_tokens=max_new, do_sample=False, num_beams=3,
                         length_penalty=1.0, eos_token_id=eos, pad_token_id=0),
        jax.random.key(0), with_stats=True,
    )

    def upto(arr):
        arr = np.asarray(arr).copy()
        for r in arr:
            hits = np.flatnonzero(r == eos)
            if hits.size:
                r[hits[0] + 1:] = 0
        return arr

    np.testing.assert_array_equal(upto(ours), upto(_pad_hf_rows(hf_hot, max_new)))
    assert int(steps) < max_new, "the early-stop heuristic never cut any decode steps"


def test_sample_early_exit_when_all_eos():
    """Greedy decode halts once every row emitted EOS; outputs are identical to the
    full-length run (done rows only ever write pad)."""
    from projectiontrainer_tpu.generate import decode

    hf_cfg, model, jcfg, params = _tiny_hf_lm()
    rng = np.random.default_rng(12)
    ids = rng.integers(1, hf_cfg.vocab_size, size=(2, 5))
    embeds = dec.embed(params, jcfg, jnp.asarray(ids))
    mask = jnp.ones(ids.shape, jnp.int32)
    max_new = 32
    probe = np.asarray(generate(
        params, jcfg, embeds, mask,
        GenerationConfig(max_new_tokens=max_new, pad_token_id=0),
    ))
    eos = int(probe[0, 2])  # a token both rows emit early-ish (greedy is det.)
    out, steps = decode._generate_sample(
        params, jcfg, embeds, mask,
        GenerationConfig(max_new_tokens=max_new, eos_token_id=eos, pad_token_id=0),
        jax.random.key(0), with_stats=True,
    )
    out = np.asarray(out)
    # every row ends in eos then pads; loop stopped at the last row's eos
    eos_cols = [int(np.argmax(out[i] == eos)) for i in range(out.shape[0])]
    assert int(steps) == max(eos_cols) + 1 < max_new
    for i, c in enumerate(eos_cols):
        assert (out[i, c + 1:] == 0).all()
