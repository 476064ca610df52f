"""HTTP serving loop tests (serving/server.py): engine thread + endpoints."""

import json
import urllib.request

import numpy as np
import pytest

from gptq_gguf_tpu.models import llama
from gptq_gguf_tpu.serving import engine as eng_mod, server as server_mod

RNG = np.random.default_rng(71)


@pytest.fixture(scope="module")
def http_server():
    cfg = llama.LlamaConfig(
        vocab_size=64, hidden_size=32, intermediate_size=64,
        num_hidden_layers=1, num_attention_heads=2, num_key_value_heads=2,
    )
    params = llama.init_params(cfg, seed=29)
    eng = eng_mod.ContinuousBatchingEngine(params, cfg, num_slots=2, max_len=64)
    server, runner = server_mod.serve_http(eng, port=0, block=False)
    yield cfg, params, server.server_address
    server.shutdown()
    runner.stop()


def _post(addr, payload):
    req = urllib.request.Request(
        f"http://{addr[0]}:{addr[1]}/completion",
        data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"},
    )
    with urllib.request.urlopen(req, timeout=120) as r:
        return json.loads(r.read())


def test_health(http_server):
    cfg, params, addr = http_server
    with urllib.request.urlopen(f"http://{addr[0]}:{addr[1]}/health", timeout=30) as r:
        out = json.loads(r.read())
    assert out["status"] == "ok"


def test_completion_matches_generate(http_server):
    cfg, params, addr = http_server
    prompt = RNG.integers(0, cfg.vocab_size, size=(6,)).tolist()
    out = _post(addr, {"prompt_tokens": prompt, "max_new_tokens": 5})
    expected = eng_mod.generate(params, cfg, [np.asarray(prompt)], max_new_tokens=5)[0]
    assert out["tokens"] == expected
    assert out["latency_s"] >= 0


def test_concurrent_requests(http_server):
    import concurrent.futures

    cfg, params, addr = http_server
    prompts = [RNG.integers(0, cfg.vocab_size, size=(n,)).tolist() for n in (4, 6, 5)]
    with concurrent.futures.ThreadPoolExecutor(3) as ex:
        outs = list(ex.map(
            lambda p: _post(addr, {"prompt_tokens": p, "max_new_tokens": 4}), prompts
        ))
    for p, o in zip(prompts, outs):
        expected = eng_mod.generate(params, cfg, [np.asarray(p)], max_new_tokens=4)[0]
        assert o["tokens"] == expected


def test_bad_request(http_server):
    cfg, params, addr = http_server
    req = urllib.request.Request(
        f"http://{addr[0]}:{addr[1]}/completion", data=b"{}",
        headers={"Content-Type": "application/json"},
    )
    with pytest.raises(urllib.error.HTTPError) as e:
        urllib.request.urlopen(req, timeout=30)
    assert e.value.code == 400
