"""Post-compression finetuning utilities.

Functional equivalents of the reference's distillation leftovers
(evopress/src/losses.py:6-13 squarehead loss; optim_utils.py:12-29 masked
optimizer; prompter.py Alpaca templates), expressed with optax. These
support sparse/quantized finetuning after search — the reference vendored
them from the EvoPress repo (SURVEY.md #26).
"""

from __future__ import annotations

from typing import Any, Dict, List, Optional

import jax
import jax.numpy as jnp


def squarehead_loss(student_feats: jax.Array, teacher_feats: jax.Array) -> jax.Array:
    """Per-layer feature distillation: ||s - t||^2 / ||t||^2
    (losses.py:6-13)."""
    num = jnp.sum((student_feats.astype(jnp.float32) - teacher_feats.astype(jnp.float32)) ** 2)
    den = jnp.maximum(jnp.sum(teacher_feats.astype(jnp.float32) ** 2), 1e-30)
    return num / den


def masked_sgd(learning_rate: float, masks):
    """Optimizer that freezes pruned (zero-masked) weights — the sparse
    finetuning wrapper (optim_utils.py:12-29) as an optax transform.

    masks: pytree matching params with 1.0 where trainable.
    """
    import optax

    def mask_updates(updates):
        return jax.tree.map(lambda u, m: u * m, updates, masks)

    base = optax.sgd(learning_rate)

    def init(params):
        return base.init(params)

    def update(updates, state, params=None):
        updates, state = base.update(updates, state, params)
        return mask_updates(updates), state

    import optax as _o

    return _o.GradientTransformation(init, update)


def sparsity_masks(params) -> Any:
    """Masks preserving the sparsity pattern (nonzero -> trainable)."""
    return jax.tree.map(lambda p: (p != 0).astype(p.dtype), params)


ALPACA_TEMPLATE = {
    "prompt_input": (
        "Below is an instruction that describes a task, paired with an input "
        "that provides further context. Write a response that appropriately "
        "completes the request.\n\n### Instruction:\n{instruction}\n\n"
        "### Input:\n{input}\n\n### Response:\n"
    ),
    "prompt_no_input": (
        "Below is an instruction that describes a task. Write a response "
        "that appropriately completes the request.\n\n### Instruction:\n"
        "{instruction}\n\n### Response:\n"
    ),
}


def build_prompt(instruction: str, input_text: str = "") -> str:
    """Alpaca prompt template (prompter.py:8-85)."""
    if input_text:
        return ALPACA_TEMPLATE["prompt_input"].format(
            instruction=instruction, input=input_text
        )
    return ALPACA_TEMPLATE["prompt_no_input"].format(instruction=instruction)
