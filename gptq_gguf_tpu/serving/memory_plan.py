"""HBM memory planning for quantized serving across a device mesh.

Answers "does this model at this quant type with this batch/context fit on
N chips?" analytically — the 70B-scale deployment planning the BASELINE
north star calls for. Accounts for:

  * packed weights in the v2 runtime format (per-tensor exact byte counts,
    TP-sharded over the tp axis),
  * the KV cache (bf16 or int8+scales), sharded over kv heads under tp,
  * replicated embeddings + vocab-sharded lm_head,
  * a workspace allowance for activations/collectives.

Numbers are bytes-exact for the weight planes (same formulas as
ops.qmatmul pack_runtime_v2) — not estimates.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, Optional

from ..formats.ggml import GGMLQuantizationType, KQUANT_SPECS, QK_K
from ..models.llama import LlamaConfig

# chip HBM capacities (bytes)
CHIP_HBM = {
    "v5e": 16 << 30,
    "v5p": 95 << 30,
    "v4": 32 << 30,
    "v6e": 32 << 30,
}


def rql_v2_bytes(d_out: int, d_in: int, qtype: GGMLQuantizationType,
                 d_rep: int = 2) -> int:
    """Exact byte count of one v2-packed weight (matches pack_runtime_v2)."""
    spec = KQUANT_SPECS[qtype]
    per_byte = 2 if spec.bits <= 4 else 1
    n_sg = d_in // QK_K
    ng = d_in // spec.group_size
    n = d_in // per_byte * d_out          # qs
    n += 4 * d_rep * n_sg * d_out         # d_sg
    n += ng * d_out                       # sc_q
    if not spec.signed:
        n += 4 * d_rep * n_sg * d_out     # dmin_sg
        n += ng * d_out                   # mn_q
    return n


@dataclasses.dataclass
class MemoryPlan:
    weights_per_chip: int
    kv_per_chip: int
    embed_per_chip: int
    workspace: int
    total_per_chip: int
    hbm_per_chip: int
    fits: bool
    detail: Dict[str, int]

    def gb(self, n: int) -> float:
        return round(n / (1 << 30), 2)

    def summary(self) -> Dict[str, float]:
        return {
            "weights_gb": self.gb(self.weights_per_chip),
            "kv_gb": self.gb(self.kv_per_chip),
            "embed_gb": self.gb(self.embed_per_chip),
            "workspace_gb": self.gb(self.workspace),
            "total_gb": self.gb(self.total_per_chip),
            "hbm_gb": self.gb(self.hbm_per_chip),
            "fits": self.fits,
        }


def plan_serving_memory(
    cfg: LlamaConfig,
    *,
    qtype: GGMLQuantizationType = GGMLQuantizationType.Q4_K,
    head_qtype: GGMLQuantizationType = GGMLQuantizationType.Q6_K,
    batch: int = 8,
    max_len: int = 4096,
    tp: int = 1,
    kv_quantized=False,  # bool (legacy int8 switch) or "bf16"|"int8"|"int4"
    chip: str = "v5e",
    workspace_frac: float = 0.08,
) -> MemoryPlan:
    """Per-chip HBM plan for TP-sharded quantized serving."""
    H = cfg.hidden_size
    I = cfg.intermediate_size
    hd = cfg.head_dim_
    nH, nKV = cfg.num_attention_heads, cfg.num_key_value_heads
    L = cfg.num_hidden_layers
    V = cfg.vocab_size

    layer = (
        rql_v2_bytes(nH * hd, H, qtype)        # q
        + 2 * rql_v2_bytes(nKV * hd, H, qtype)  # k, v
        + rql_v2_bytes(H, nH * hd, qtype)       # o
        + 2 * rql_v2_bytes(I, H, qtype)         # gate, up
        + rql_v2_bytes(H, I, qtype)             # down
        + 4 * H * 4                             # norms (f32)
    )
    if cfg.moe_num_experts:
        I_e = cfg.moe_intermediate_size or I
        layer += cfg.moe_num_experts * (
            2 * rql_v2_bytes(I_e, H, qtype) + rql_v2_bytes(H, I_e, qtype)
        ) + cfg.moe_num_experts * H * 4  # router f32
    weights = layer * L
    head = rql_v2_bytes(V, H, head_qtype)
    weights_per_chip = (weights + head) // tp

    embed_per_chip = V * H * 2  # bf16, replicated (gather path)

    kv_entries = 2 * L * batch * nKV * max_len * hd
    kv_dtype = (kv_quantized if isinstance(kv_quantized, str)
                else ("int8" if kv_quantized else "bf16"))
    if kv_dtype == "int8":
        kv = kv_entries + 2 * L * batch * nKV * max_len * 4  # int8 + f32 scale
    elif kv_dtype == "int4":
        # packed codes (hd/2 bytes) + f32 scale per 32-feature group
        kv = kv_entries // 2 + 4 * kv_entries // 32
    else:
        kv = kv_entries * 2  # bf16
    kv_per_chip = kv // tp

    hbm = CHIP_HBM[chip]
    workspace = int(hbm * workspace_frac)
    total = weights_per_chip + embed_per_chip + kv_per_chip + workspace
    return MemoryPlan(
        weights_per_chip=weights_per_chip,
        kv_per_chip=kv_per_chip,
        embed_per_chip=embed_per_chip,
        workspace=workspace,
        total_per_chip=total,
        hbm_per_chip=hbm,
        fits=total <= hbm,
        detail={"layer_bytes": layer, "lm_head_bytes": head},
    )


LLAMA3_70B = LlamaConfig(
    vocab_size=128256, hidden_size=8192, intermediate_size=28672,
    num_hidden_layers=80, num_attention_heads=64, num_key_value_heads=8,
    max_position_embeddings=131072, rope_theta=500000.0,
)

LLAMA3_8B = LlamaConfig(
    vocab_size=128256, hidden_size=4096, intermediate_size=14336,
    num_hidden_layers=32, num_attention_heads=32, num_key_value_heads=8,
    max_position_embeddings=131072, rope_theta=500000.0,
)
