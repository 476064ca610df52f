"""Observability: logging, stage timing, profiling, optional wandb.

The reference has only prints + tqdm + optional wandb (SURVEY.md §5.1/5.5);
here every pipeline stage can emit structured timings and wrap itself in a
``jax.profiler`` trace for TPU timeline analysis.
"""

from __future__ import annotations

import contextlib
import json
import logging
import time
from pathlib import Path
from typing import Any, Dict, Optional

logger = logging.getLogger("gptq_gguf_tpu")
if not logger.handlers:
    _h = logging.StreamHandler()
    _h.setFormatter(logging.Formatter("[%(asctime)s %(name)s] %(message)s", "%H:%M:%S"))
    logger.addHandler(_h)
    logger.setLevel(logging.INFO)


class StageTimer:
    """Accumulates per-stage wall times; dumps JSON."""

    def __init__(self):
        self.times: Dict[str, float] = {}

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self.times[name] = self.times.get(name, 0.0) + time.perf_counter() - t0
            logger.info("stage %s: %.2fs (total %.2fs)", name, time.perf_counter() - t0, self.times[name])

    def dump(self, path) -> None:
        Path(path).write_text(json.dumps(self.times, indent=2))


@contextlib.contextmanager
def profile_trace(log_dir: Optional[str] = None):
    """jax.profiler trace context (view with TensorBoard / xprof)."""
    if not log_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class WandbLogger:
    """Optional wandb sink (reference quant.py:113, evo_quant_search.py:321)."""

    def __init__(self, enabled: bool = False, **init_kwargs):
        self.run = None
        if enabled:
            try:
                import wandb

                self.run = wandb.init(**init_kwargs)
            except Exception as e:  # pragma: no cover
                logger.warning("wandb unavailable: %s", e)

    def log(self, metrics: Dict[str, Any]) -> None:
        if self.run is not None:
            self.run.log(metrics)
