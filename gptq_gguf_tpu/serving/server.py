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

stdlib-only (http.server + threading): no server framework dependency.
"""

from __future__ import annotations

import json
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Any, Dict, Optional

import numpy as np

from .sampling import SamplingParams


def _sampling_from_json(req: Dict[str, Any]) -> Optional[SamplingParams]:
    keys = ("temperature", "top_k", "top_p", "min_p", "presence_penalty",
            "frequency_penalty", "repetition_penalty")
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
    )


class EngineRunner:
    """Background thread stepping the engine; completion events per uid."""

    def __init__(self, engine, poll_idle_s: float = 0.005):
        self.engine = engine
        self.lock = threading.Lock()
        self.events: Dict[int, threading.Event] = {}
        self.results: Dict[int, Any] = {}
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
               sampling_params: Optional[SamplingParams] = None) -> int:
        ev = threading.Event()
        with self.lock:
            uid = self.engine.submit(prompt, max_new_tokens,
                                     sampling_params=sampling_params)
            self.events[uid] = ev
        return uid

    def wait(self, uid: int, timeout: Optional[float] = None):
        ev = self.events[uid]
        if not ev.wait(timeout):
            raise TimeoutError(f"request {uid} timed out")
        with self.lock:
            self.events.pop(uid, None)
            return self.results.pop(uid)

    def _loop(self):
        while not self._stop:
            with self.lock:
                active = self.engine.step()
                for req in self.engine.completed:
                    ev = self.events.get(req.uid)
                    if ev is not None and not ev.is_set():
                        self.results[req.uid] = req
                        ev.set()
                self.engine.completed.clear()
            if active == 0:
                time.sleep(self.poll_idle_s)


def make_handler(runner: EngineRunner, tokenizer=None):
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

        def do_GET(self):
            if self.path == "/health":
                eng = runner.engine
                self._json(200, {
                    "status": "ok",
                    "active": sum(r is not None for r in eng.slot_req),
                    "queued": len(eng.queue),
                })
            else:
                self._json(404, {"error": "unknown path"})

        def do_POST(self):
            try:
                n = int(self.headers.get("Content-Length", 0))
                req = json.loads(self.rfile.read(n) or b"{}")
                if self.path == "/completion":
                    self._completion(req)
                elif self.path == "/v1/chat/completions":
                    self._chat(req)
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
            t0 = time.time()
            uid = runner.submit(prompt, max_new, _sampling_from_json(req))
            result = runner.wait(uid, timeout=float(req.get("timeout_s", 600)))
            out: Dict[str, Any] = {
                "tokens": result.output,
                "finish_reason": result.finish_reason,
                "latency_s": round(time.time() - t0, 3),
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
            text = tokenizer.apply_chat_template(
                messages, add_generation_prompt=True, tokenize=False)
            prompt = np.asarray(tokenizer(text)["input_ids"], np.int64)
            max_new = int(req.get("max_tokens", req.get("max_new_tokens", 128)))
            sp = _sampling_from_json(req)
            t0 = time.time()
            uid = runner.submit(prompt, max_new, sp)
            result = runner.wait(uid, timeout=float(req.get("timeout_s", 600)))
            out_tokens = list(result.output)
            finish = result.finish_reason or "length"
            eos = getattr(runner.engine, "eos", None)
            if eos is not None and out_tokens and out_tokens[-1] == eos:
                out_tokens = out_tokens[:-1]
            content = tokenizer.decode(out_tokens)
            stops = req.get("stop") or []
            if isinstance(stops, str):
                stops = [stops]
            for s in stops:
                i = content.find(s)
                if i >= 0:
                    content, finish = content[:i], "stop"
            self._json(200, {
                "id": f"chatcmpl-{result.uid}",
                "object": "chat.completion",
                "created": int(t0),
                "model": req.get("model", "gptq-gguf-tpu"),
                "choices": [{
                    "index": 0,
                    "message": {"role": "assistant", "content": content},
                    "finish_reason": finish,
                }],
                "usage": {
                    "prompt_tokens": int(prompt.size),
                    "completion_tokens": len(result.output),
                    "total_tokens": int(prompt.size) + len(result.output),
                },
            })

    return Handler


def serve_http(engine, host: str = "127.0.0.1", port: int = 8080,
               tokenizer=None, block: bool = True):
    """Start the engine thread + HTTP server. Returns (server, runner) when
    block=False (caller shuts down via server.shutdown(); runner.stop())."""
    runner = EngineRunner(engine).start()
    server = ThreadingHTTPServer((host, port), make_handler(runner, tokenizer))
    if not block:
        threading.Thread(target=server.serve_forever, daemon=True).start()
        return server, runner
    try:
        print(f"serving on http://{host}:{server.server_address[1]}")
        server.serve_forever()
    finally:
        runner.stop()
