"""Numerical parity of the generic decoder vs HF torch Gemma3/Qwen3 on tiny random models.

This is the build's substitute for the reference's absent unit tests (SURVEY §4): the
reference trusts HF modeling code; we prove equivalence tensor-for-tensor in fp32.
"""

import numpy as np
import pytest
import torch

from projectiontrainer_tpu.models import decoder as dec

import jax.numpy as jnp

pytestmark = pytest.mark.slow  # torch/HF parity fixtures dominate the suite runtime

TOL = dict(rtol=2e-4, atol=2e-4)


def _hf_gemma3(vocab=257, hidden=64, layers=6, heads=4, kv_heads=2, head_dim=16):
    from transformers import Gemma3TextConfig
    from transformers.models.gemma3.modeling_gemma3 import Gemma3TextModel

    cfg = Gemma3TextConfig(
        vocab_size=vocab, hidden_size=hidden, intermediate_size=hidden * 4,
        num_hidden_layers=layers, num_attention_heads=heads, num_key_value_heads=kv_heads,
        head_dim=head_dim, sliding_window=8, rope_theta=1_000_000.0,
        rope_local_base_freq=10_000.0, query_pre_attn_scalar=head_dim,
        max_position_embeddings=128, attn_implementation="eager",
    )
    torch.manual_seed(0)
    model = Gemma3TextModel(cfg).eval()
    return cfg, model


def _hf_qwen3(vocab=257, hidden=64, layers=3, heads=4, kv_heads=2, head_dim=16):
    from transformers import Qwen3Config
    from transformers.models.qwen3.modeling_qwen3 import Qwen3Model

    cfg = Qwen3Config(
        vocab_size=vocab, hidden_size=hidden, intermediate_size=hidden * 4,
        num_hidden_layers=layers, num_attention_heads=heads, num_key_value_heads=kv_heads,
        head_dim=head_dim, rope_theta=1_000_000.0, max_position_embeddings=128,
        attn_implementation="eager",
    )
    torch.manual_seed(1)
    model = Qwen3Model(cfg).eval()
    return cfg, model


def _hf_llama(vocab=257, hidden=64, layers=3, heads=4, kv_heads=2, *, llama3_rope=True):
    from transformers import LlamaConfig
    from transformers.models.llama.modeling_llama import LlamaModel

    cfg = LlamaConfig(
        vocab_size=vocab, hidden_size=hidden, intermediate_size=hidden * 4,
        num_hidden_layers=layers, num_attention_heads=heads, num_key_value_heads=kv_heads,
        rope_theta=500_000.0, max_position_embeddings=128,
        rope_scaling=(
            {"rope_type": "llama3", "factor": 8.0, "low_freq_factor": 1.0,
             "high_freq_factor": 4.0, "original_max_position_embeddings": 64}
            if llama3_rope else None
        ),
        attn_implementation="eager",
    )
    torch.manual_seed(2)
    model = LlamaModel(cfg).eval()
    return cfg, model


def _hf_mistral(vocab=257, hidden=64, layers=3, heads=4, kv_heads=2):
    from transformers import MistralConfig
    from transformers.models.mistral.modeling_mistral import MistralModel

    cfg = MistralConfig(
        vocab_size=vocab, hidden_size=hidden, intermediate_size=hidden * 4,
        num_hidden_layers=layers, num_attention_heads=heads, num_key_value_heads=kv_heads,
        rope_theta=10_000.0, sliding_window=8, max_position_embeddings=128,
        attn_implementation="eager",
    )
    torch.manual_seed(3)
    model = MistralModel(cfg).eval()
    return cfg, model


def _run_parity(hf_cfg, hf_model, with_padding=False):
    cfg = dec.from_hf_config(hf_cfg)
    sd = {k: v.detach().numpy() for k, v in hf_model.state_dict().items()}
    params = dec.params_from_hf_state_dict(cfg, sd)

    rng = np.random.default_rng(42)
    b, t = 2, 17
    ids = rng.integers(0, hf_cfg.vocab_size, size=(b, t))
    attn = np.ones((b, t), dtype=np.int64)
    if with_padding:
        attn[0, :5] = 0  # left padding on sample 0
        ids[0, :5] = 0

    with torch.no_grad():
        if with_padding:
            position_ids = torch.tensor(np.maximum(attn.cumsum(-1) - 1, 0))
            out = hf_model(
                input_ids=torch.tensor(ids), attention_mask=torch.tensor(attn),
                position_ids=position_ids,
            ).last_hidden_state.numpy()
        else:
            out = hf_model(
                input_ids=torch.tensor(ids), attention_mask=torch.tensor(attn)
            ).last_hidden_state.numpy()

    positions = None
    if with_padding:
        positions = jnp.asarray(np.maximum(attn.cumsum(-1) - 1, 0))
    hidden, _ = dec.forward(
        params, cfg, input_ids=jnp.asarray(ids),
        attention_mask=jnp.asarray(attn), positions=positions,
    )
    ours = np.asarray(hidden)
    if with_padding:
        # padded positions are garbage in both impls; compare valid region only
        np.testing.assert_allclose(ours[0, 5:], out[0, 5:], **TOL)
        np.testing.assert_allclose(ours[1], out[1], **TOL)
    else:
        np.testing.assert_allclose(ours, out, **TOL)


def test_gemma3_parity():
    _run_parity(*_hf_gemma3())


def test_gemma3_parity_with_padding():
    _run_parity(*_hf_gemma3(), with_padding=True)


def test_gemma3_sliding_layers_present():
    hf_cfg, _ = _hf_gemma3()
    cfg = dec.from_hf_config(hf_cfg)
    assert "sliding" in cfg.layer_types and "full" in cfg.layer_types


def test_qwen3_parity():
    _run_parity(*_hf_qwen3())


def test_qwen3_parity_with_padding():
    _run_parity(*_hf_qwen3(), with_padding=True)


def test_llama_parity_llama3_rope():
    """Llama structure incl. the frequency-dependent llama3 rope scaling."""
    _run_parity(*_hf_llama())


def test_llama_parity_plain_rope_with_padding():
    _run_parity(*_hf_llama(llama3_rope=False), with_padding=True)


def test_mistral_parity_sliding_window():
    """Mistral: every layer slides (window smaller than the 17-token test seq)."""
    hf_cfg, hf_model = _hf_mistral()
    cfg = dec.from_hf_config(hf_cfg)
    assert set(cfg.layer_types) == {"sliding"} and cfg.sliding_window == 8
    _run_parity(hf_cfg, hf_model)


def test_inputs_embeds_path_matches_ids_path():
    hf_cfg, hf_model = _hf_gemma3()
    cfg = dec.from_hf_config(hf_cfg)
    sd = {k: v.detach().numpy() for k, v in hf_model.state_dict().items()}
    params = dec.params_from_hf_state_dict(cfg, sd)
    ids = np.arange(10)[None, :] % hf_cfg.vocab_size
    emb = dec.embed(params, cfg, jnp.asarray(ids))
    h1, _ = dec.forward(params, cfg, input_ids=jnp.asarray(ids))
    h2, _ = dec.forward(params, cfg, inputs_embeds=emb)
    np.testing.assert_allclose(np.asarray(h1), np.asarray(h2), rtol=1e-6, atol=1e-6)


def test_tied_logits_shape():
    hf_cfg, hf_model = _hf_gemma3()
    cfg = dec.from_hf_config(hf_cfg)
    sd = {k: v.detach().numpy() for k, v in hf_model.state_dict().items()}
    params = dec.params_from_hf_state_dict(cfg, sd)
    ids = np.arange(6)[None, :]
    hidden, _ = dec.forward(params, cfg, input_ids=jnp.asarray(ids))
    logits = dec.logits(params, cfg, hidden)
    assert logits.shape == (1, 6, hf_cfg.vocab_size)
    assert logits.dtype == jnp.float32
