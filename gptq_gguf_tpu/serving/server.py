"""Minimal HTTP inference server over the continuous-batching engine.

The reference's serving story ends at "hand the .gguf to llama.cpp's
llama-server" (README.md:325); this is the TPU-native equivalent: a single
background thread steps the ContinuousBatchingEngine while HTTP workers
enqueue requests and block on completion events.

Endpoints (JSON):
  POST /completion   {"prompt_tokens": [..], "max_new_tokens": N}
                     -> {"tokens": [...], "latency_s": ..}
                     (or {"prompt": "text"} when a tokenizer is loaded)
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

    def submit(self, prompt: np.ndarray, max_new_tokens: int) -> int:
        ev = threading.Event()
        with self.lock:
            uid = self.engine.submit(prompt, max_new_tokens)
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
            if self.path != "/completion":
                self._json(404, {"error": "unknown path"})
                return
            try:
                n = int(self.headers.get("Content-Length", 0))
                req = json.loads(self.rfile.read(n) or b"{}")
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
                uid = runner.submit(prompt, max_new)
                result = runner.wait(uid, timeout=float(req.get("timeout_s", 600)))
                out: Dict[str, Any] = {
                    "tokens": result.output,
                    "latency_s": round(time.time() - t0, 3),
                }
                if tokenizer is not None:
                    out["text"] = tokenizer.decode(result.output)
                self._json(200, out)
            except TimeoutError as e:
                self._json(504, {"error": str(e)})
            except Exception as e:  # noqa: BLE001 - surface to the client
                self._json(500, {"error": f"{type(e).__name__}: {e}"})

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
