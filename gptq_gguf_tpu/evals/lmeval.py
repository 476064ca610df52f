"""lm-eval-harness integration.

The reference wraps lm-eval by monkeypatching
``AutoModelForCausalLM.from_pretrained`` to inject compressed weights
(eval/lmeval.py:252-288). Here the JAX model is exposed as a first-class
``lm_eval.api.model.LM`` subclass instead — no patching, and any param
pytree (float, dequantized, weight-swapped) can be evaluated directly.

lm_eval is an optional dependency; everything degrades gracefully to an
ImportError with instructions when it is absent.
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional, Tuple

import numpy as np

try:
    import lm_eval
    from lm_eval.api.model import LM
    from lm_eval.api.instance import Instance

    HAS_LM_EVAL = True
except Exception:  # pragma: no cover - optional dep
    HAS_LM_EVAL = False
    LM = object


from ..models.llama import LlamaConfig


class JaxCausalLM(LM):
    """lm-eval adapter over (params, cfg, tokenizer)."""

    def __init__(self, params, cfg: LlamaConfig, tokenizer, batch_size: int = 1, max_length: Optional[int] = None):
        if not HAS_LM_EVAL:
            raise ImportError(
                "lm_eval is not installed; `pip install lm-eval` to use JaxCausalLM"
            )
        super().__init__()
        self.params = params
        self.cfg = cfg
        self.tokenizer = tokenizer
        self.batch_size = batch_size
        self.max_length = max_length or cfg.max_position_embeddings

    # -- helpers -----------------------------------------------------------

    def _encode(self, text: str) -> List[int]:
        return self.tokenizer(text, add_special_tokens=False)["input_ids"]

    def _logits(self, ids: np.ndarray) -> np.ndarray:
        import jax.numpy as jnp

        from ..models import llama

        return np.asarray(llama.forward(self.params, jnp.asarray(ids), self.cfg))

    def _score_continuation(self, context_ids: List[int], cont_ids: List[int]) -> Tuple[float, bool]:
        ids = (context_ids + cont_ids)[-self.max_length :]
        n_cont = len(cont_ids)
        arr = np.asarray(ids, dtype=np.int64)[None, :]
        logits = self._logits(arr)[0]
        # logits for cont positions: predictions at positions len-n_cont-1 .. len-2
        lp = 0.0
        greedy = True
        start = arr.shape[1] - n_cont - 1
        for k, tok in enumerate(cont_ids):
            row = logits[start + k]
            row = row - row.max()
            logz = np.log(np.exp(row).sum())
            lp += float(row[tok] - logz)
            if int(np.argmax(row)) != tok:
                greedy = False
        return lp, greedy

    # -- LM interface ------------------------------------------------------

    def loglikelihood(self, requests) -> List[Tuple[float, bool]]:
        out = []
        for req in requests:
            context, continuation = req.args
            ctx_ids = self._encode(context) if context else [self.tokenizer.bos_token_id or 0]
            cont_ids = self._encode(continuation)
            out.append(self._score_continuation(ctx_ids, cont_ids))
        return out

    def loglikelihood_rolling(self, requests) -> List[float]:
        out = []
        for req in requests:
            (text,) = req.args
            ids = self._encode(text)[: self.max_length]
            if len(ids) < 2:
                out.append(0.0)
                continue
            arr = np.asarray(ids, dtype=np.int64)[None, :]
            logits = self._logits(arr)[0]
            lp = 0.0
            for k in range(1, len(ids)):
                row = logits[k - 1]
                row = row - row.max()
                lp += float(row[ids[k]] - np.log(np.exp(row).sum()))
            out.append(lp)
        return out

    def generate_until(self, requests) -> List[str]:
        from ..serving import engine

        out = []
        for req in requests:
            context, gen_kwargs = req.args
            until = gen_kwargs.get("until", [])
            max_new = gen_kwargs.get("max_gen_toks", 128)
            ctx_ids = np.asarray(self._encode(context), dtype=np.int64)
            toks = engine.generate(
                self.params, self.cfg, [ctx_ids], max_new_tokens=max_new,
                eos_token_id=self.tokenizer.eos_token_id,
            )[0]
            text = self.tokenizer.decode(toks)
            for stop in until:
                idx = text.find(stop)
                if idx >= 0:
                    text = text[:idx]
            out.append(text)
        return out


def evaluate(
    params,
    cfg: LlamaConfig,
    tokenizer,
    tasks: List[str],
    num_fewshot: Optional[int] = None,
    batch_size: int = 1,
    limit: Optional[int] = None,
) -> Dict[str, Any]:
    """simple_evaluate wrapper (reference eval/lmeval.py:299-407)."""
    if not HAS_LM_EVAL:
        raise ImportError("lm_eval is not installed")
    lm = JaxCausalLM(params, cfg, tokenizer, batch_size=batch_size)
    return lm_eval.simple_evaluate(
        model=lm, tasks=tasks, num_fewshot=num_fewshot, limit=limit
    )
