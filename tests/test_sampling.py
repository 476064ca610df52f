"""Per-slot batched sampler (serving/sampling.py) + engine/server wiring.

The reference has no sampler (its deployment target is llama.cpp's
sampler chain, common/sampling.cpp); these tests pin the llama.cpp
semantics of each stage and the engine's mixed greedy/sampled batching.
"""

import json
import urllib.request

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gptq_gguf_tpu.models import llama
from gptq_gguf_tpu.serving import engine as eng_mod
from gptq_gguf_tpu.serving import sampling
from gptq_gguf_tpu.serving.sampling import GREEDY, SamplingParams

RNG = np.random.default_rng(81)


def _state(rows, vocab):
    st = sampling.init_state(len(rows), vocab)
    for i, sp in enumerate(rows):
        st = sampling.set_slot(st, i, sp)
    return st


def _draw(logits, st, n=64, seed=0):
    keys = jax.random.split(jax.random.PRNGKey(seed), n)
    return np.stack([np.asarray(sampling.sample(jnp.asarray(logits), st, k))
                     for k in keys])


def test_greedy_is_argmax():
    logits = RNG.normal(size=(3, 17)).astype(np.float32)
    st = _state([GREEDY] * 3, 17)
    out = _draw(logits, st, n=4)
    assert (out == logits.argmax(-1)[None, :]).all()


def test_top_k_one_is_argmax_even_with_temperature():
    logits = RNG.normal(size=(2, 33)).astype(np.float32)
    st = _state([SamplingParams(temperature=5.0, top_k=1)] * 2, 33)
    out = _draw(logits, st, n=16)
    assert (out == logits.argmax(-1)[None, :]).all()


def test_top_k_restricts_support():
    logits = RNG.normal(size=(1, 64)).astype(np.float32)
    st = _state([SamplingParams(temperature=10.0, top_k=5)], 64)
    out = _draw(logits, st, n=200)
    top5 = set(np.argsort(logits[0])[-5:].tolist())
    assert set(out.ravel().tolist()) <= top5
    assert len(set(out.ravel().tolist())) > 1  # actually samples


def test_top_p_keeps_smallest_prefix():
    # one dominant token (p=0.9-ish) -> top_p=0.5 keeps only it
    logits = np.zeros((1, 8), np.float32)
    logits[0, 3] = 10.0
    st = _state([SamplingParams(temperature=1.0, top_p=0.5)], 8)
    out = _draw(logits, st, n=32)
    assert (out == 3).all()


def test_top_p_one_keeps_everything():
    logits = np.zeros((1, 6), np.float32)  # uniform
    st = _state([SamplingParams(temperature=1.0, top_p=1.0)], 6)
    out = _draw(logits, st, n=300)
    assert len(set(out.ravel().tolist())) == 6


def test_min_p_masks_tail():
    logits = np.zeros((1, 8), np.float32)
    logits[0, 2] = 3.0  # max prob; others ~e^-3 of it
    st = _state([SamplingParams(temperature=1.0, min_p=0.5)], 8)
    out = _draw(logits, st, n=64)
    assert (out == 2).all()


def test_frequency_penalty_blocks_repeats():
    logits = np.zeros((1, 8), np.float32)
    logits[0, 5] = 4.0
    sp = SamplingParams(frequency_penalty=100.0)  # greedy + huge penalty
    st = _state([sp], 8)
    st = st._replace(counts=st.counts.at[0, 5].set(1))
    out = _draw(logits, st, n=4)
    assert (out != 5).all()


def test_repetition_penalty_llama_cpp_semantics():
    # positive logits divided, negative multiplied — only for seen tokens
    logits = np.array([[2.0, -0.5, 1.9, 0.0]], np.float32)
    sp = SamplingParams(repetition_penalty=10.0)
    st = _state([sp], 4)
    st = st._replace(counts=st.counts.at[0, 0].set(1))
    out = _draw(logits, st, n=2)
    # token 0: 2.0/10 = 0.2 < 1.9 -> argmax moves to token 2
    assert (out == 2).all()


def test_mixed_batch_greedy_rows_deterministic():
    logits = RNG.normal(size=(4, 32)).astype(np.float32)
    st = _state([GREEDY, SamplingParams(temperature=2.0), GREEDY,
                 SamplingParams(temperature=2.0, top_k=4)], 32)
    out = _draw(logits, st, n=32)
    assert (out[:, 0] == logits[0].argmax()).all()
    assert (out[:, 2] == logits[2].argmax()).all()


def test_sample_slot_matches_row():
    logits = RNG.normal(size=(3, 16)).astype(np.float32)
    st = _state([GREEDY, SamplingParams(temperature=1.0, top_k=1), GREEDY], 16)
    tok, st2 = sampling.sample_slot(jnp.asarray(logits[1]), st, 1)
    assert int(tok) == int(logits[1].argmax())
    # the sampled slot's key advanced; the others are untouched
    assert not np.array_equal(np.asarray(st2.keys[1]), np.zeros(2))


def test_seed_reproducibility(tiny_model):
    """SamplingParams.seed makes sampled generation reproducible across
    engines and request order; different seeds diverge."""
    cfg, params = tiny_model

    def run(seed, engine_seed):
        eng = eng_mod.ContinuousBatchingEngine(
            params, cfg, num_slots=2, max_len=64, seed=engine_seed)
        uid = eng.submit(np.arange(5), 8, sampling_params=SamplingParams(
            temperature=1.5, seed=seed))
        return {r.uid: r for r in eng.run_until_done()}[uid].output

    a = run(7, engine_seed=0)
    b = run(7, engine_seed=123)  # engine seed must not matter
    c = run(8, engine_seed=0)
    assert a == b
    assert a != c  # overwhelmingly likely at temperature 1.5


def test_chat_n_choices(tiny_model):
    import urllib.request

    from gptq_gguf_tpu.serving import server as server_mod
    from gptq_gguf_tpu.serving.tokenizer import GGUFTokenizer

    cfg, params = tiny_model
    tmpl = "{% for m in messages %}{{ m.content }}{% endfor %}"
    gg = GGUFTokenizer("gpt2", [chr(ord("A") + i) for i in range(64)],
                       merges=[], chat_template=tmpl)

    class _Wrap:
        def __call__(self, text):
            return {"input_ids": gg.encode(text)}

        def decode(self, ids):
            return gg.decode(ids)

        apply_chat_template = staticmethod(gg.apply_chat_template)

    eng = eng_mod.ContinuousBatchingEngine(params, cfg, num_slots=4, max_len=64)
    server, runner = server_mod.serve_http(eng, port=0, tokenizer=_Wrap(),
                                           block=False)
    try:
        addr = server.server_address
        req = urllib.request.Request(
            f"http://{addr[0]}:{addr[1]}/v1/chat/completions",
            data=json.dumps({"messages": [{"role": "user", "content": "BC"}],
                             "max_tokens": 5, "n": 3,
                             "temperature": 1.0, "seed": 5}).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=120) as r:
            out = json.loads(r.read())
        assert [c["index"] for c in out["choices"]] == [0, 1, 2]
        assert out["usage"]["completion_tokens"] >= 3
        # seeds offset per choice: not all three identical (overwhelmingly)
        texts = [c["message"]["content"] for c in out["choices"]]
        assert len(set(texts)) >= 2
    finally:
        server.shutdown()
        runner.stop()


@pytest.fixture(scope="module")
def tiny_model():
    cfg = llama.LlamaConfig(
        vocab_size=64, hidden_size=32, intermediate_size=64,
        num_hidden_layers=1, num_attention_heads=2, num_key_value_heads=2,
    )
    return cfg, llama.init_params(cfg, seed=33)


def test_engine_per_request_sampling(tiny_model):
    """A greedy request in a mixed batch is token-identical to a pure-greedy
    run; a top_k=1 'sampled' request degenerates to the same greedy tokens."""
    cfg, params = tiny_model
    prompts = [RNG.integers(0, 64, size=(5,)), RNG.integers(0, 64, size=(7,))]
    ref = eng_mod.generate(params, cfg, prompts, max_new_tokens=6)

    eng = eng_mod.ContinuousBatchingEngine(params, cfg, num_slots=2, max_len=64)
    u0 = eng.submit(prompts[0], 6)  # greedy
    u1 = eng.submit(prompts[1], 6,
                    sampling_params=SamplingParams(temperature=1.0, top_k=1))
    done = {r.uid: r for r in eng.run_until_done()}
    assert done[u0].output == ref[0]
    assert done[u1].output == ref[1]


def test_engine_sampled_tokens_valid(tiny_model):
    cfg, params = tiny_model
    eng = eng_mod.ContinuousBatchingEngine(params, cfg, num_slots=2, max_len=64)
    uid = eng.submit(RNG.integers(0, 64, size=(4,)), 8,
                     sampling_params=SamplingParams(temperature=1.5, top_p=0.9))
    done = {r.uid: r for r in eng.run_until_done()}
    assert len(done[uid].output) == 8
    assert all(0 <= t < 64 for t in done[uid].output)
    assert done[uid].finish_reason == "length"


def test_paged_engine_sampling(tiny_model):
    cfg, params = tiny_model
    eng = eng_mod.PagedContinuousBatchingEngine(
        params, cfg, num_slots=2, max_len=64, page_size=16)
    prompt = RNG.integers(0, 64, size=(5,))
    ref = eng_mod.generate(params, cfg, [prompt], max_new_tokens=6)[0]
    uid = eng.submit(prompt, 6,
                     sampling_params=SamplingParams(temperature=1.0, top_k=1))
    done = {r.uid: r for r in eng.run_until_done()}
    assert done[uid].output == ref


def test_server_sampling_and_chat(tiny_model):
    """/completion accepts sampling fields; /v1/chat/completions renders the
    chat template, stops at eos, and reports OpenAI-shaped JSON."""
    from gptq_gguf_tpu.serving import server as server_mod
    from gptq_gguf_tpu.serving.tokenizer import GGUFTokenizer

    cfg, params = tiny_model
    tmpl = ("{% for m in messages %}<|{{ m.role }}|>{{ m.content }}"
            "{% endfor %}{% if add_generation_prompt %}<|assistant|>{% endif %}")
    vocab = [f"<t{i}>" for i in range(60)] + [
        "<|user|>", "<|assistant|>", "</s>", "<unk>"]
    # USER_DEFINED/CONTROL types: with merges=[] and NORMAL pieces, BPE
    # cannot compose "<t5>" from bytes and encode() returns [] — which the
    # engine now rejects loudly instead of serving an empty prompt
    gg = GGUFTokenizer("gpt2", vocab, merges=[], eos_id=62,
                       chat_template=tmpl,
                       token_types=[4] * 60 + [3, 3, 3, 2])

    class _Wrap:
        def __call__(self, text):
            return {"input_ids": gg.encode(text)}

        def decode(self, ids):
            return gg.decode(ids)

        apply_chat_template = staticmethod(gg.apply_chat_template)

    eng = eng_mod.ContinuousBatchingEngine(params, cfg, num_slots=2,
                                           max_len=64, eos_token_id=62)
    server, runner = server_mod.serve_http(eng, port=0, tokenizer=_Wrap(),
                                           block=False)
    try:
        addr = server.server_address

        def post(path, payload):
            req = urllib.request.Request(
                f"http://{addr[0]}:{addr[1]}{path}",
                data=json.dumps(payload).encode(),
                headers={"Content-Type": "application/json"})
            with urllib.request.urlopen(req, timeout=120) as r:
                return json.loads(r.read())

        out = post("/completion", {"prompt_tokens": [1, 2, 3],
                                   "max_new_tokens": 4,
                                   "temperature": 1.0, "top_k": 1})
        ref = eng_mod.generate(params, cfg, [np.asarray([1, 2, 3])],
                               max_new_tokens=4, eos_token_id=62)[0]
        assert out["tokens"] == ref

        chat = post("/v1/chat/completions",
                    {"messages": [{"role": "user", "content": "<t5><t6>"}],
                     "max_tokens": 5})
        assert chat["object"] == "chat.completion"
        assert chat["choices"][0]["finish_reason"] in ("stop", "length")
        assert "content" in chat["choices"][0]["message"]
        assert chat["usage"]["completion_tokens"] >= 1
    finally:
        server.shutdown()
        runner.stop()


def _sse_lines(resp):
    out = []
    for raw in resp:
        line = raw.decode().strip()
        if line.startswith("data: "):
            out.append(line[len("data: "):])
    return out


def test_streaming_endpoints(tiny_model):
    """SSE streaming: /completion token chunks reassemble to the blocking
    result; chat chunks' deltas concatenate to the blocking content; a stop
    string ends the stream early and cancels the request."""
    from gptq_gguf_tpu.serving import server as server_mod
    from gptq_gguf_tpu.serving.tokenizer import GGUFTokenizer

    cfg, params = tiny_model
    tmpl = "{% for m in messages %}{{ m.content }}{% endfor %}"
    vocab = [f"<t{i}>" for i in range(64)]
    gg = GGUFTokenizer("gpt2", vocab, merges=[], chat_template=tmpl,
                       token_types=[4] * 64)  # see test_server_sampling_and_chat

    class _Wrap:
        def __call__(self, text):
            return {"input_ids": gg.encode(text)}

        def decode(self, ids):
            return gg.decode(ids)

        apply_chat_template = staticmethod(gg.apply_chat_template)

    eng = eng_mod.ContinuousBatchingEngine(params, cfg, num_slots=2, max_len=64)
    server, runner = server_mod.serve_http(eng, port=0, tokenizer=_Wrap(),
                                           block=False)
    try:
        addr = server.server_address

        def post(path, payload):
            return urllib.request.urlopen(urllib.request.Request(
                f"http://{addr[0]}:{addr[1]}{path}",
                data=json.dumps(payload).encode(),
                headers={"Content-Type": "application/json"}), timeout=120)

        # /completion streaming == blocking tokens
        ref = eng_mod.generate(params, cfg, [np.asarray([1, 2, 3])],
                               max_new_tokens=6)[0]
        lines = _sse_lines(post("/completion", {
            "prompt_tokens": [1, 2, 3], "max_new_tokens": 6, "stream": True}))
        assert lines[-1] == "[DONE]"
        toks = []
        for ln in lines[:-1]:
            toks.extend(json.loads(ln).get("tokens", []))
        assert toks == ref
        assert json.loads(lines[-2])["finish_reason"] == "length"

        # chat streaming deltas == blocking content
        msgs = [{"role": "user", "content": "<t5><t6><t7>"}]
        blocking = json.loads(post("/v1/chat/completions", {
            "messages": msgs, "max_tokens": 6}).read())
        content = blocking["choices"][0]["message"]["content"]
        lines = _sse_lines(post("/v1/chat/completions", {
            "messages": msgs, "max_tokens": 6, "stream": True}))
        assert lines[-1] == "[DONE]"
        chunks = [json.loads(ln) for ln in lines[:-1]]
        assert chunks[0]["choices"][0]["delta"].get("role") == "assistant"
        assert chunks[0]["object"] == "chat.completion.chunk"
        got = "".join(c["choices"][0]["delta"].get("content", "")
                      for c in chunks)
        assert got == content
        assert chunks[-1]["choices"][0]["finish_reason"] == "length"

        # stop string cuts the stream and frees the slot
        stop_tok = content[:4] if len(content) >= 4 else content
        lines = _sse_lines(post("/v1/chat/completions", {
            "messages": msgs, "max_tokens": 6, "stream": True,
            "stop": [stop_tok]}))
        chunks = [json.loads(ln) for ln in lines[:-1]]
        assert chunks[-1]["choices"][0]["finish_reason"] == "stop"
        got = "".join(c["choices"][0]["delta"].get("content", "")
                      for c in chunks)
        assert stop_tok not in got
    finally:
        server.shutdown()
        runner.stop()


def test_logprobs(tiny_model):
    """Per-token top-k logprobs: chosen-token logprob consistency (greedy
    choice must be the top-1 entry), shapes, and /completion plumbing."""
    cfg, params = tiny_model
    eng = eng_mod.ContinuousBatchingEngine(params, cfg, num_slots=2, max_len=64)
    uid = eng.submit(RNG.integers(0, 64, size=(5,)), 5, logprobs=3)
    done = {r.uid: r for r in eng.run_until_done()}
    req = done[uid]
    assert len(req.logprob_data) == len(req.output) == 5
    for tok, (chosen_lp, ids, vals) in zip(req.output, req.logprob_data):
        assert len(ids) == len(vals) == 3
        assert ids[0] == tok          # greedy pick == top-1
        assert abs(vals[0] - chosen_lp) < 1e-5
        assert vals[0] >= vals[1] >= vals[2]
        assert all(v <= 0.0 for v in vals)

    # paged engine mirrors it
    peng = eng_mod.PagedContinuousBatchingEngine(
        params, cfg, num_slots=2, max_len=64, page_size=16)
    uid = peng.submit(RNG.integers(0, 64, size=(5,)), 4, logprobs=2)
    done = {r.uid: r for r in peng.run_until_done()}
    assert len(done[uid].logprob_data) == 4
    assert done[uid].logprob_data[0][1][0] == done[uid].output[0]


def test_logprobs_http(tiny_model):
    from gptq_gguf_tpu.serving import server as server_mod

    cfg, params = tiny_model
    eng = eng_mod.ContinuousBatchingEngine(params, cfg, num_slots=2, max_len=64)
    server, runner = server_mod.serve_http(eng, port=0, block=False)
    try:
        addr = server.server_address
        req = urllib.request.Request(
            f"http://{addr[0]}:{addr[1]}/completion",
            data=json.dumps({"prompt_tokens": [1, 2], "max_new_tokens": 3,
                             "logprobs": 2}).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=120) as r:
            out = json.loads(r.read())
        assert len(out["logprobs"]["token_logprobs"]) == 3
        assert len(out["logprobs"]["top"][0]) == 2
        assert out["logprobs"]["top"][0][0]["id"] == out["tokens"][0]
    finally:
        server.shutdown()
        runner.stop()


def test_openai_aux_endpoints(tiny_model):
    """/v1/models, /v1/completions, /tokenize, /detokenize."""
    from gptq_gguf_tpu.serving import server as server_mod
    from gptq_gguf_tpu.serving.tokenizer import GGUFTokenizer

    cfg, params = tiny_model
    # single-char BPE vocab (chars map straight through the byte encoder)
    alphabet = [chr(ord("A") + i) for i in range(64)]
    gg = GGUFTokenizer("gpt2", alphabet, merges=[])

    class _Wrap:
        def __call__(self, text):
            return {"input_ids": gg.encode(text)}

        def decode(self, ids):
            return gg.decode(ids)

    eng = eng_mod.ContinuousBatchingEngine(params, cfg, num_slots=2, max_len=64)
    server, runner = server_mod.serve_http(eng, port=0, tokenizer=_Wrap(),
                                           block=False)
    try:
        addr = server.server_address
        base = f"http://{addr[0]}:{addr[1]}"
        with urllib.request.urlopen(f"{base}/v1/models", timeout=30) as r:
            models = json.loads(r.read())
        assert models["data"][0]["object"] == "model"

        def post(path, payload):
            req = urllib.request.Request(
                f"{base}{path}", data=json.dumps(payload).encode(),
                headers={"Content-Type": "application/json"})
            with urllib.request.urlopen(req, timeout=120) as r:
                return json.loads(r.read())

        tok = post("/tokenize", {"content": "EF"})
        assert tok["tokens"] == [4, 5]
        detok = post("/detokenize", {"tokens": [4, 5]})
        assert detok["content"] == "EF"

        out = post("/v1/completions", {"prompt": "BC", "max_tokens": 4})
        assert out["object"] == "text_completion"
        ref = eng_mod.generate(params, cfg, [np.asarray([1, 2])],
                               max_new_tokens=4)[0]
        assert out["choices"][0]["text"] == gg.decode(ref)
        assert out["usage"]["prompt_tokens"] == 2
    finally:
        server.shutdown()
        runner.stop()
