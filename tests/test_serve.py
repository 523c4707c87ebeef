"""Serving CLI: micro-batched HTTP VQA endpoint on tiny models (CPU).

Covers the deployment path the batch-inference CLI doesn't: concurrent requests
coalescing into one static-shape generate batch, base64 image intake, health/stats
endpoints, and error surfacing.
"""

import base64
import concurrent.futures
import io
import json
import threading
import urllib.request

import numpy as np
import pytest
import torch

from projectiontrainer_tpu import testing as T

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def service_and_server(tmp_path_factory):
    from transformers import (
        Gemma3TextConfig, SiglipConfig, SiglipTextConfig, SiglipVisionConfig,
    )
    from transformers.models.gemma3.modeling_gemma3 import Gemma3ForCausalLM
    from transformers.models.siglip.modeling_siglip import SiglipModel

    base = tmp_path_factory.mktemp("serve")
    torch.manual_seed(0)
    tok = T.word_tokenizer()
    vis_dir = str(base / "siglip-tiny")
    SiglipModel(SiglipConfig(
        vision_config=SiglipVisionConfig(
            hidden_size=32, intermediate_size=64, num_hidden_layers=2,
            num_attention_heads=4, image_size=32, patch_size=8,
        ).to_dict(),
        text_config=SiglipTextConfig(
            hidden_size=32, intermediate_size=64, num_hidden_layers=2,
            num_attention_heads=4, vocab_size=len(tok.get_vocab()),
            max_position_embeddings=16,
        ).to_dict(),
    )).save_pretrained(vis_dir)
    llm_dir = str(base / "gemma3-tiny")
    Gemma3ForCausalLM(Gemma3TextConfig(
        vocab_size=len(tok.get_vocab()), hidden_size=32, intermediate_size=64,
        num_hidden_layers=2, num_attention_heads=2, num_key_value_heads=1,
        head_dim=16, sliding_window=8, query_pre_attn_scalar=16,
        max_position_embeddings=256,
    )).save_pretrained(llm_dir)
    tok.save_pretrained(llm_dir)
    root, _ = T.synthetic_corpus(str(base / "corpus"), n=2, image_size=32)

    import logging

    from projectiontrainer_tpu.cli.serve import VQAService, build_parser, make_server

    args = build_parser().parse_args([
        "--vision_model_name", vis_dir, "--llm_name", llm_dir,
        "--projector_path", "",  # random-init projector (no stage-1 artifact needed)
        "--image_root", root, "--img_size", "32", "--batch_size", "4",
        "--max_q_len", "16", "--max_new_tokens", "6", "--num_beams", "1",
        "--max_wait_ms", "150",
    ])
    service = VQAService(args, logging.getLogger("serve-test"))
    server = make_server(service, "127.0.0.1", 0)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    yield service, server, root
    service.shutdown()
    server.shutdown()
    server.server_close()


def _url(server, path):
    return f"http://127.0.0.1:{server.server_address[1]}{path}"


def _post(server, payload: dict) -> dict:
    req = urllib.request.Request(
        _url(server, "/v1/vqa"), data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req, timeout=600) as resp:
        return json.loads(resp.read())


def test_health_and_single_request(service_and_server):
    service, server, root = service_and_server
    with urllib.request.urlopen(_url(server, "/healthz"), timeout=30) as resp:
        health = json.loads(resp.read())
    assert health["ok"] and health["devices"]

    service.warmup()  # compiles exactly the clamped bucket shapes the runtime uses

    out = _post(server, {"image_path": "cxr_0.jpg",
                         "question": "What disease is shown ?"})
    assert isinstance(out["answer"], str) and out["latency_ms"] > 0

    # absolute server path bypasses --image_root resolution
    import os

    out = _post(server, {"image_path": os.path.join(root, "cxr_1.jpg"),
                         "question": "And this one ?"})
    assert isinstance(out["answer"], str)


def test_concurrent_requests_micro_batch(service_and_server):
    """4 concurrent posts must coalesce into fewer device batches than requests."""
    service, server, root = service_and_server
    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(
        np.random.default_rng(0).integers(0, 255, (32, 32, 3), np.uint8)
    ).save(buf, format="JPEG")
    b64 = base64.b64encode(buf.getvalue()).decode()

    before = service.stats()["batches"]
    with concurrent.futures.ThreadPoolExecutor(4) as ex:
        outs = list(ex.map(
            lambda i: _post(server, {"image": b64, "question": f"Is finding {i} shown ?"}),
            range(4),
        ))
    assert all(isinstance(o["answer"], str) for o in outs)
    stats = service.stats()
    assert stats["requests"] >= 4
    # coalescing: 4 concurrent requests should need at most 3 new batches (usually 1)
    assert stats["batches"] - before <= 3
    assert stats["p50_latency_s"] > 0


def test_bad_request_is_400_not_crash(service_and_server):
    _, server, _ = service_and_server
    req = urllib.request.Request(
        _url(server, "/v1/vqa"), data=json.dumps({"question": "no image"}).encode(),
        headers={"Content-Type": "application/json"},
    )
    with pytest.raises(urllib.error.HTTPError) as err:
        urllib.request.urlopen(req, timeout=30)
    assert err.value.code == 400
    # server still alive
    out = _post(server, {"image_path": "cxr_1.jpg", "question": "still alive ?"})
    assert isinstance(out["answer"], str)
