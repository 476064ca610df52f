"""Minimal HTTP inference server over the continuous-batching engine.

The reference's serving story ends at "hand the .gguf to llama.cpp's
llama-server" (README.md:325); this is the TPU-native equivalent: a single
background thread steps the ContinuousBatchingEngine while HTTP workers
enqueue requests and block on completion events.

Endpoints (JSON):
  POST /completion   {"prompt_tokens": [..], "max_new_tokens": N,
                      "temperature": t, "top_k": k, "top_p": p, "min_p": m,
                      "presence_penalty": a, "frequency_penalty": b,
                      "repetition_penalty": r}
                     -> {"tokens": [...], "latency_s": ..}
                     (or {"prompt": "text"} when a tokenizer is loaded)
  POST /v1/chat/completions
                     OpenAI-compatible subset: {"messages": [...],
                     "max_tokens": N, "temperature"/"top_p"/..., "stop": [..]}
                     -> {"choices": [{"message": ..., "finish_reason": ..}],
                         "usage": {...}}. Requires a tokenizer whose GGUF/HF
                     side carries a chat template.
  GET  /health       -> {"status": "ok", "active": n, "queued": m}

Both POST endpoints accept "stream": true and then reply as server-sent
events (text/event-stream): /completion streams {"tokens": [...]} chunks,
/v1/chat/completions streams OpenAI chat.completion.chunk deltas; both
terminate with "data: [DONE]". A stop-string hit cancels the in-flight
request, freeing its slot immediately.

stdlib-only (http.server + threading): no server framework dependency.
"""

from __future__ import annotations

import json
import queue
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Any, Dict, Optional

import numpy as np

from .sampling import SamplingParams


def _sampling_from_json(req: Dict[str, Any]) -> Optional[SamplingParams]:
    keys = ("temperature", "top_k", "top_p", "min_p", "presence_penalty",
            "frequency_penalty", "repetition_penalty", "seed")
    if not any(k in req for k in keys):
        return None
    return SamplingParams(
        temperature=float(req.get("temperature", 0.0)),
        top_k=int(req.get("top_k", 0)),
        top_p=float(req.get("top_p", 1.0)),
        min_p=float(req.get("min_p", 0.0)),
        presence_penalty=float(req.get("presence_penalty", 0.0)),
        frequency_penalty=float(req.get("frequency_penalty", 0.0)),
        repetition_penalty=float(req.get("repetition_penalty", 1.0)),
        seed=int(req["seed"]) if req.get("seed") is not None else None,
    )


class EngineRunner:
    """Background thread stepping the engine; completion events per uid.

    Streaming: submit(stream=True) attaches a per-uid queue that receives
    (new_tokens, done_request_or_None) tuples after every engine step —
    the SSE handlers drain it without blocking the step loop.
    """

    def __init__(self, engine, poll_idle_s: float = 0.005):
        self.engine = engine
        self.lock = threading.Lock()
        self.events: Dict[int, threading.Event] = {}
        self.results: Dict[int, Any] = {}
        self.streams: Dict[int, "queue.Queue"] = {}
        self._sent: Dict[int, int] = {}
        self.poll_idle_s = poll_idle_s
        self._stop = False
        self.thread = threading.Thread(target=self._loop, daemon=True)

    def start(self):
        self.thread.start()
        return self

    def stop(self):
        self._stop = True
        self.thread.join(timeout=5)

    def submit(self, prompt: np.ndarray, max_new_tokens: int,
               sampling_params: Optional[SamplingParams] = None,
               stream: bool = False, logprobs: int = 0,
               soft_embeds=None, soft_token_id=None,
               rope_positions=None, rope_next=None,
               soft_bidir=False) -> int:
        ev = threading.Event()
        with self.lock:
            uid = self.engine.submit(prompt, max_new_tokens,
                                     sampling_params=sampling_params,
                                     logprobs=logprobs,
                                     soft_embeds=soft_embeds,
                                     soft_token_id=soft_token_id,
                                     rope_positions=rope_positions,
                                     rope_next=rope_next,
                                     soft_bidir=soft_bidir)
            self.events[uid] = ev
            if stream:
                self.streams[uid] = queue.Queue()
                self._sent[uid] = 0
        return uid

    def wait(self, uid: int, timeout: Optional[float] = None):
        ev = self.events[uid]
        if not ev.wait(timeout):
            raise TimeoutError(f"request {uid} timed out")
        with self.lock:
            self.events.pop(uid, None)
            return self.results.pop(uid)

    def stream_queue(self, uid: int) -> "queue.Queue":
        return self.streams[uid]

    def cancel(self, uid: int) -> bool:
        with self.lock:
            ok = self.engine.cancel(uid)
            self.events.pop(uid, None)
            self.results.pop(uid, None)
            self.streams.pop(uid, None)
            self._sent.pop(uid, None)
        return ok

    def _push_stream(self, req, done: bool) -> None:
        q = self.streams.get(req.uid)
        if q is None:
            return
        sent = self._sent.get(req.uid, 0)
        fresh = req.output[sent:]
        self._sent[req.uid] = len(req.output)
        if fresh or done:
            q.put((fresh, req if done else None))
        if done:
            self.streams.pop(req.uid, None)
            self._sent.pop(req.uid, None)

    def _loop(self):
        while not self._stop:
            with self.lock:
                # keep SSE chunks interactive: cap auto decode blocks at 8
                # steps while any stream is attached (tokens surface at
                # block edges); batch clients get full-size blocks
                if hasattr(self.engine, "auto_cap"):
                    self.engine.auto_cap = 8 if self.streams else None
                active = self.engine.step()
                if self.streams:
                    for req in self.engine.slot_req:
                        if req is not None:
                            self._push_stream(req, done=False)
                for req in self.engine.completed:
                    self._push_stream(req, done=True)
                    ev = self.events.get(req.uid)
                    if ev is not None and not ev.is_set():
                        self.results[req.uid] = req
                        ev.set()
                self.engine.completed.clear()
            if active == 0:
                time.sleep(self.poll_idle_s)


def make_handler(runner: EngineRunner, tokenizer=None, embedder=None,
                 imager=None, reranker=None):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *args):  # quiet
            pass

        def _json(self, code: int, payload: Dict[str, Any]):
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        # -- server-sent events ------------------------------------------
        def _sse_start(self):
            self.send_response(200)
            self.send_header("Content-Type", "text/event-stream")
            self.send_header("Cache-Control", "no-cache")
            self.end_headers()

        def _sse_send(self, payload):
            data = payload if isinstance(payload, str) else json.dumps(payload)
            self.wfile.write(f"data: {data}\n\n".encode())
            self.wfile.flush()

        def do_GET(self):
            if self.path == "/health":
                eng = runner.engine
                self._json(200, {
                    "status": "ok",
                    "active": sum(r is not None for r in eng.slot_req),
                    "queued": len(eng.queue),
                })
            elif self.path == "/v1/models":
                self._json(200, {"object": "list", "data": [{
                    "id": "gptq-gguf-tpu", "object": "model",
                    "owned_by": "gptq-gguf-tpu"}]})
            else:
                self._json(404, {"error": "unknown path"})

        def do_POST(self):
            try:
                n = int(self.headers.get("Content-Length", 0))
                req = json.loads(self.rfile.read(n) or b"{}")
                if self.path == "/completion":
                    self._completion(req)
                elif self.path == "/v1/completions":
                    self._v1_completions(req)
                elif self.path == "/v1/chat/completions":
                    self._chat(req)
                elif self.path == "/v1/embeddings":
                    self._embeddings(req)
                elif self.path in ("/v1/rerank", "/rerank"):
                    self._rerank(req)
                elif self.path == "/tokenize":
                    self._tokenize(req)
                elif self.path == "/detokenize":
                    self._detokenize(req)
                else:
                    self._json(404, {"error": "unknown path"})
            except TimeoutError as e:
                self._json(504, {"error": str(e)})
            except Exception as e:  # noqa: BLE001 - surface to the client
                self._json(500, {"error": f"{type(e).__name__}: {e}"})

        def _completion(self, req):
            if "prompt_tokens" in req:
                prompt = np.asarray(req["prompt_tokens"], np.int64)
            elif "prompt" in req and tokenizer is not None:
                prompt = np.asarray(
                    tokenizer(req["prompt"])["input_ids"], np.int64
                )
            else:
                self._json(400, {"error": "need prompt_tokens (or prompt with a tokenizer)"})
                return
            max_new = int(req.get("max_new_tokens", 64))
            timeout = float(req.get("timeout_s", 600))
            t0 = time.time()
            if req.get("stream"):
                uid = runner.submit(prompt, max_new, _sampling_from_json(req),
                                    stream=True)
                q = runner.stream_queue(uid)
                self._sse_start()
                while True:
                    fresh, done = q.get(timeout=timeout)
                    if fresh:
                        self._sse_send({"tokens": fresh})
                    if done is not None:
                        self._sse_send({"finish_reason": done.finish_reason,
                                        "latency_s": round(time.time() - t0, 3)})
                        self._sse_send("[DONE]")
                        runner.wait(uid, timeout=1)  # reap the result entry
                        return
            uid = runner.submit(prompt, max_new, _sampling_from_json(req),
                                logprobs=int(req.get("logprobs", 0)))
            result = runner.wait(uid, timeout=timeout)
            out: Dict[str, Any] = {
                "tokens": result.output,
                "finish_reason": result.finish_reason,
                "latency_s": round(time.time() - t0, 3),
            }
            if result.logprob_data:
                out["logprobs"] = {
                    "token_logprobs": [d[0] for d in result.logprob_data],
                    "top": [[{"id": i, "logprob": v}
                             for i, v in zip(d[1], d[2])]
                            for d in result.logprob_data],
                }
            if tokenizer is not None:
                out["text"] = tokenizer.decode(result.output)
            self._json(200, out)

        def _chat(self, req):
            """OpenAI-compatible chat completion (non-streaming subset):
            renders the tokenizer's chat template, generates, trims at eos
            and any "stop" strings."""
            if tokenizer is None or not hasattr(tokenizer, "apply_chat_template"):
                self._json(400, {"error": "no chat-capable tokenizer loaded"})
                return
            messages = req.get("messages")
            if not messages:
                self._json(400, {"error": "need messages"})
                return
            # OpenAI multi-part content: extract data-URI images (VLM),
            # flatten the text parts for the chat template
            images = []
            flat_msgs = []
            for msg in messages:
                content = msg.get("content")
                if isinstance(content, list):
                    texts = []
                    for part in content:
                        if part.get("type") == "image_url":
                            url = part["image_url"]["url"]
                            if not url.startswith("data:"):
                                self._json(400, {"error":
                                           "only data: image URLs supported"})
                                return
                            import base64

                            images.append(base64.b64decode(
                                url.split(",", 1)[1]))
                        elif part.get("type") == "text":
                            texts.append(part.get("text", ""))
                    msg = {**msg, "content": "".join(texts)}
                flat_msgs.append(msg)
            if images and imager is None:
                self._json(400, {"error": "no vision tower loaded "
                                          "(serve --mmproj)"})
                return
            text = tokenizer.apply_chat_template(
                flat_msgs, add_generation_prompt=True, tokenize=False)
            prompt = np.asarray(tokenizer(text)["input_ids"], np.int64)
            soft_embeds = soft_tok = rope_positions = rope_next = None
            soft_bidir = False
            if images:
                out = imager(images)
                soft_embeds, soft_tok = out[0], out[1]
                pos_fn = out[2] if len(out) > 2 else None
                soft_bidir = bool(out[3]) if len(out) > 3 else False
                n_soft = soft_embeds.shape[0]
                prompt = np.concatenate([
                    np.full((n_soft,), soft_tok, np.int64), prompt])
                if pos_fn is not None:  # mrope archs (qwen2-vl family)
                    rope_positions, rope_next = pos_fn(prompt)
            max_new = int(req.get("max_tokens", req.get("max_new_tokens", 128)))
            sp = _sampling_from_json(req)
            stops = req.get("stop") or []
            if isinstance(stops, str):
                stops = [stops]
            want_lp = int(req.get("top_logprobs", 1)) if req.get("logprobs") \
                else 0
            t0 = time.time()
            if req.get("stream"):
                self._chat_stream(req, prompt, max_new, sp, stops, t0,
                                  soft_embeds, soft_tok, rope_positions,
                                  rope_next, soft_bidir)
                return
            import dataclasses as _dc

            n = max(1, int(req.get("n", 1)))
            uids = []
            for i in range(n):
                sp_i = sp
                if n > 1 and sp is not None and sp.seed is not None:
                    sp_i = _dc.replace(sp, seed=sp.seed + i)  # distinct draws
                uids.append(runner.submit(
                    prompt, max_new, sp_i, logprobs=want_lp,
                    soft_embeds=soft_embeds, soft_token_id=soft_tok,
                    rope_positions=rope_positions, rope_next=rope_next,
                    soft_bidir=soft_bidir))
            timeout = float(req.get("timeout_s", 600))
            results = [runner.wait(u, timeout=timeout) for u in uids]
            eos = getattr(runner.engine, "eos", None)
            choices = []
            total_out = 0
            for idx, result in enumerate(results):
                out_tokens = list(result.output)
                total_out += len(out_tokens)
                finish = result.finish_reason or "length"
                if eos is not None and out_tokens and out_tokens[-1] == eos:
                    out_tokens = out_tokens[:-1]
                content = tokenizer.decode(out_tokens)
                for s in stops:
                    i = content.find(s)
                    if i >= 0:
                        content, finish = content[:i], "stop"
                choice: Dict[str, Any] = {
                    "index": idx,
                    "message": {"role": "assistant", "content": content},
                    "finish_reason": finish,
                }
                if result.logprob_data:
                    choice["logprobs"] = {"content": [
                        {"token": tokenizer.decode([t]), "logprob": d[0],
                         "top_logprobs": [
                             {"token": tokenizer.decode([i]), "logprob": v}
                             for i, v in zip(d[1], d[2])]}
                        for t, d in zip(result.output, result.logprob_data)]}
                choices.append(choice)
            self._json(200, {
                "id": f"chatcmpl-{results[0].uid}",
                "object": "chat.completion",
                "created": int(t0),
                "model": req.get("model", "gptq-gguf-tpu"),
                "choices": choices,
                "usage": {
                    "prompt_tokens": int(prompt.size),
                    "completion_tokens": total_out,
                    "total_tokens": int(prompt.size) + total_out,
                },
            })

        def _tokenize(self, req):
            """llama.cpp /tokenize analogue."""
            if tokenizer is None or "content" not in req:
                self._json(400, {"error": "need content (and a tokenizer)"})
                return
            self._json(200, {
                "tokens": list(map(int, tokenizer(req["content"])["input_ids"]))})

        def _detokenize(self, req):
            """llama.cpp /detokenize analogue."""
            if tokenizer is None or "tokens" not in req:
                self._json(400, {"error": "need tokens (and a tokenizer)"})
                return
            self._json(200, {"content": tokenizer.decode(
                [int(t) for t in req["tokens"]])})

        def _v1_completions(self, req):
            """OpenAI legacy text-completions shape over the engine."""
            prompt = req.get("prompt")
            if prompt is None or tokenizer is None:
                self._json(400, {"error": "need prompt (and a tokenizer)"})
                return
            ids = np.asarray(tokenizer(prompt)["input_ids"], np.int64)
            max_new = int(req.get("max_tokens", 16))
            t0 = time.time()
            uid = runner.submit(ids, max_new, _sampling_from_json(req))
            result = runner.wait(uid, timeout=float(req.get("timeout_s", 600)))
            out_tokens = list(result.output)
            finish = result.finish_reason or "length"
            eos = getattr(runner.engine, "eos", None)
            if eos is not None and out_tokens and out_tokens[-1] == eos:
                out_tokens = out_tokens[:-1]
            text = tokenizer.decode(out_tokens)
            stops = req.get("stop") or []
            if isinstance(stops, str):
                stops = [stops]
            for s in stops:
                i = text.find(s)
                if i >= 0:
                    text, finish = text[:i], "stop"
            self._json(200, {
                "id": f"cmpl-{result.uid}",
                "object": "text_completion",
                "created": int(t0),
                "model": req.get("model", "gptq-gguf-tpu"),
                "choices": [{"index": 0, "text": text,
                             "finish_reason": finish}],
                "usage": {"prompt_tokens": int(ids.size),
                          "completion_tokens": len(result.output),
                          "total_tokens": int(ids.size) + len(result.output)},
            })

        def _embeddings(self, req):
            """OpenAI-compatible embeddings endpoint (encoder GGUFs)."""
            if embedder is None:
                self._json(400, {"error": "no embedding model loaded"})
                return
            inputs = req.get("input")
            if inputs is None:
                self._json(400, {"error": "need input"})
                return
            if isinstance(inputs, str):
                inputs = [inputs]
            vecs, n_tokens = embedder(inputs)
            self._json(200, {
                "object": "list",
                "model": req.get("model", "gptq-gguf-tpu"),
                "data": [{"object": "embedding", "index": i,
                          "embedding": [float(x) for x in v]}
                         for i, v in enumerate(vecs)],
                "usage": {"prompt_tokens": n_tokens,
                          "total_tokens": n_tokens},
            })

        def _rerank(self, req):
            """llama.cpp /rerank analogue (Jina/Cohere-style JSON)."""
            if reranker is None:
                self._json(400, {"error": "no reranker model loaded"})
                return
            query = req.get("query")
            docs = req.get("documents")
            if not query or not docs:
                self._json(400, {"error": "need query and documents"})
                return
            scores = reranker(query, list(docs))
            results = sorted(
                ({"index": i, "relevance_score": float(s)}
                 for i, s in enumerate(scores)),
                key=lambda d: -d["relevance_score"])
            top_n = req.get("top_n")
            if top_n:
                results = results[: int(top_n)]
            self._json(200, {"model": req.get("model", "gptq-gguf-tpu"),
                             "results": results})

        def _chat_stream(self, req, prompt, max_new, sp, stops, t0,
                         soft_embeds=None, soft_tok=None,
                         rope_positions=None, rope_next=None,
                         soft_bidir=False):
            """OpenAI chat.completion.chunk SSE stream. Text already decoded
            is held back by max(len(stop))-1 chars so a stop string straddling
            two chunks is never partially emitted."""
            uid = runner.submit(prompt, max_new, sp, stream=True,
                                soft_embeds=soft_embeds,
                                soft_token_id=soft_tok,
                                rope_positions=rope_positions,
                                rope_next=rope_next,
                                soft_bidir=soft_bidir)
            q = runner.stream_queue(uid)
            eos = getattr(runner.engine, "eos", None)
            base = {"id": f"chatcmpl-{uid}", "object": "chat.completion.chunk",
                    "created": int(t0), "model": req.get("model", "gptq-gguf-tpu")}
            self._sse_start()
            self._sse_send({**base, "choices": [{
                "index": 0, "delta": {"role": "assistant"},
                "finish_reason": None}]})
            hold = max((len(s) for s in stops), default=0)
            toks: list = []
            emitted = 0
            timeout = float(req.get("timeout_s", 600))
            while True:
                fresh, done = q.get(timeout=timeout)
                toks.extend(fresh)
                shown = list(toks)
                if done is not None and eos is not None and shown \
                        and shown[-1] == eos:
                    shown = shown[:-1]
                text = tokenizer.decode(shown)
                finish = None
                cut = -1
                for s in stops:
                    i = text.find(s)
                    if i >= 0 and (cut < 0 or i < cut):
                        cut = i
                if cut >= 0:
                    text, finish = text[:cut], "stop"
                elif done is not None:
                    finish = done.finish_reason or "length"
                safe = len(text) if finish else max(emitted, len(text) - hold)
                if safe > emitted:
                    self._sse_send({**base, "choices": [{
                        "index": 0, "delta": {"content": text[emitted:safe]},
                        "finish_reason": None}]})
                    emitted = safe
                if finish:
                    self._sse_send({**base, "choices": [{
                        "index": 0, "delta": {}, "finish_reason": finish}]})
                    self._sse_send("[DONE]")
                    if done is not None:
                        runner.wait(uid, timeout=1)
                    else:  # stop-string hit: free the slot immediately
                        runner.cancel(uid)
                    return

    return Handler


def serve_http(engine, host: str = "127.0.0.1", port: int = 8080,
               tokenizer=None, block: bool = True, embedder=None,
               imager=None, reranker=None):
    """Start the engine thread + HTTP server. Returns (server, runner) when
    block=False (caller shuts down via server.shutdown(); runner.stop())."""
    runner = EngineRunner(engine).start()
    server = ThreadingHTTPServer(
        (host, port),
        make_handler(runner, tokenizer, embedder, imager, reranker))
    if not block:
        threading.Thread(target=server.serve_forever, daemon=True).start()
        return server, runner
    try:
        print(f"serving on http://{host}:{server.server_address[1]}")
        server.serve_forever()
    finally:
        runner.stop()
