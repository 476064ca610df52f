"""Audio-language serving: Whisper-style tower + soft-token splice.

The reference packs whisper-family audio towers (qwen2-audio / ultravox /
voxtral) into mmproj GGUFs for llama.cpp mtmd; this module runs the
qwen2-audio family natively: mel features -> Whisper encoder (two Conv1d
stems, sinusoid position table, pre-LN blocks) -> x2 average pool ->
final LayerNorm -> linear projector -> soft tokens, spliced into the
decoder prompt at the audio-token positions (the same
forward_cached/embeds_override path serving/vlm.py uses for images).
Oracle: transformers Qwen2AudioForConditionalGeneration
(tests/test_audio_serving.py).
"""

from __future__ import annotations

import dataclasses
from pathlib import Path
from typing import Any, Dict, List, Optional, Tuple, Union

import jax
import jax.numpy as jnp
import numpy as np

from ..models.llama import LlamaConfig
from . import vlm

__all__ = ["AudioConfig", "load_hf_audio", "load_mmproj_audio_gguf",
           "whisper_encode", "audio_soft_tokens", "generate_with_audio"]


@dataclasses.dataclass(frozen=True)
class AudioConfig:
    d_model: int
    intermediate_size: int
    num_hidden_layers: int
    num_attention_heads: int
    num_mel_bins: int
    max_source_positions: int = 1500
    layer_norm_eps: float = 1e-5
    projector: str = "qwen2a"   # "qwen2a" (pool+linear) | "voxtral" (stack)
    stack_factor: int = 4


def _ln(x, w, b, eps):
    m = jnp.mean(x, axis=-1, keepdims=True)
    v = jnp.var(x, axis=-1, keepdims=True)
    return (x - m) / jnp.sqrt(v + eps) * w + b


def _conv1d(x, w, b, stride):
    """x: (B, C_in, T); w: (C_out, C_in, K); SAME-1 padding like Whisper."""
    out = jax.lax.conv_general_dilated(
        x, w, window_strides=(stride,), padding=((1, 1),),
        dimension_numbers=("NCH", "OIH", "NCH"))
    return out + b[None, :, None]


def whisper_encode(ap: Dict[str, Any], acfg: AudioConfig,
                   mel: jax.Array) -> jax.Array:
    """Whisper encoder pre-pool: (B, mel_bins, T) -> (B, T//2, D)."""
    x = jax.nn.gelu(_conv1d(mel, ap["conv1_w"], ap["conv1_b"], 1),
                    approximate=False)
    x = jax.nn.gelu(_conv1d(x, ap["conv2_w"], ap["conv2_b"], 2),
                    approximate=False)
    x = x.transpose(0, 2, 1)  # (B, T', D)
    x = x + ap["pos_embd"][: x.shape[1]]
    B = x.shape[0]
    D = acfg.d_model
    nh = acfg.num_attention_heads
    hd = D // nh
    for layer in ap["layers"]:
        h = _ln(x, layer["ln1_w"], layer["ln1_b"], acfg.layer_norm_eps)
        q = (h @ layer["q_w"].T + layer["q_b"]).reshape(B, -1, nh, hd)
        k = (h @ layer["k_w"].T).reshape(B, -1, nh, hd)  # whisper k: no bias
        v = (h @ layer["v_w"].T + layer["v_b"]).reshape(B, -1, nh, hd)
        att = jax.nn.softmax(
            jnp.einsum("bqhd,bkhd->bhqk", q, k) / jnp.sqrt(hd), axis=-1)
        ctx = jnp.einsum("bhqk,bkhd->bqhd", att, v).reshape(B, -1, D)
        x = x + ctx @ layer["o_w"].T + layer["o_b"]
        h = _ln(x, layer["ln2_w"], layer["ln2_b"], acfg.layer_norm_eps)
        h = jax.nn.gelu(h @ layer["up_w"].T + layer["up_b"],
                        approximate=False)
        x = x + h @ layer["down_w"].T + layer["down_b"]
    return x


def audio_soft_tokens(ap: Dict[str, Any], acfg: AudioConfig,
                      mel: jax.Array) -> jax.Array:
    """(B, mel_bins, T) mel -> (B, n_soft, text_hidden) soft tokens.

    qwen2a: encode, x2 average pool over time, post LayerNorm (qwen2-audio
    applies it AFTER pooling), linear projection. voxtral: encode,
    standard whisper final LayerNorm, stack stack_factor consecutive
    frames, bias-free linear -> GELU -> linear."""
    x = whisper_encode(ap, acfg, mel)
    B, T, D = x.shape
    if acfg.projector == "voxtral":
        x = _ln(x, ap["post_ln_w"], ap["post_ln_b"], acfg.layer_norm_eps)
        s = acfg.stack_factor
        x = x[:, : (T // s) * s].reshape(B, T // s, s * D)
        x = jax.nn.gelu(x @ ap["proj_w"].T, approximate=False)
        return x @ ap["proj2_w"].T
    x = x[:, : (T // 2) * 2].reshape(B, T // 2, 2, D).mean(axis=2)
    x = _ln(x, ap["post_ln_w"], ap["post_ln_b"], acfg.layer_norm_eps)
    return x @ ap["proj_w"].T + ap["proj_b"]


def load_hf_audio(model_dir: Union[str, Path]
                  ) -> Tuple[Dict[str, Any], AudioConfig]:
    """Audio tower + projector from a qwen2-audio HF checkpoint."""
    import json

    from ..models.loader import _iter_safetensors, _to_f32

    model_dir = Path(model_dir)
    with open(model_dir / "config.json") as f:
        cfg = json.load(f)
    a = cfg["audio_config"]
    voxtral = cfg.get("model_type") == "voxtral"
    d_model = a.get("d_model", a.get("hidden_size"))
    acfg = AudioConfig(
        d_model=d_model,
        intermediate_size=a.get("encoder_ffn_dim",
                                a.get("intermediate_size")),
        num_hidden_layers=a.get("encoder_layers", a.get("num_hidden_layers")),
        num_attention_heads=a.get("encoder_attention_heads",
                                  a.get("num_attention_heads")),
        num_mel_bins=a["num_mel_bins"],
        max_source_positions=a.get("max_source_positions", 1500),
        projector="voxtral" if voxtral else "qwen2a",
        # voxtral stacks intermediate_size/d_model frames (HF reshapes the
        # encoder output straight to (-1, intermediate_size))
        stack_factor=(int(a.get("intermediate_size", 4 * d_model)) // d_model
                      if voxtral else 4),
    )
    flat = {}
    for name, arr in _iter_safetensors(model_dir):
        if name.startswith("model."):
            name = name[len("model."):]
        flat[name] = jnp.asarray(_to_f32(np.asarray(arr)))
    pre = "audio_tower."
    ap: Dict[str, Any] = {
        "conv1_w": flat[pre + "conv1.weight"],
        "conv1_b": flat[pre + "conv1.bias"],
        "conv2_w": flat[pre + "conv2.weight"],
        "conv2_b": flat[pre + "conv2.bias"],
        "pos_embd": flat[pre + "embed_positions.weight"],
        "post_ln_w": flat[pre + "layer_norm.weight"],
        "post_ln_b": flat[pre + "layer_norm.bias"],
        "layers": [],
    }
    if acfg.projector == "voxtral":
        ap["proj_w"] = flat["multi_modal_projector.linear_1.weight"]
        ap["proj2_w"] = flat["multi_modal_projector.linear_2.weight"]
    else:
        ap["proj_w"] = flat["multi_modal_projector.linear.weight"]
        ap["proj_b"] = flat["multi_modal_projector.linear.bias"]
    for i in range(acfg.num_hidden_layers):
        p = f"{pre}layers.{i}."
        ap["layers"].append({
            "q_w": flat[p + "self_attn.q_proj.weight"],
            "q_b": flat[p + "self_attn.q_proj.bias"],
            "k_w": flat[p + "self_attn.k_proj.weight"],
            "v_w": flat[p + "self_attn.v_proj.weight"],
            "v_b": flat[p + "self_attn.v_proj.bias"],
            "o_w": flat[p + "self_attn.out_proj.weight"],
            "o_b": flat[p + "self_attn.out_proj.bias"],
            "ln1_w": flat[p + "self_attn_layer_norm.weight"],
            "ln1_b": flat[p + "self_attn_layer_norm.bias"],
            "ln2_w": flat[p + "final_layer_norm.weight"],
            "ln2_b": flat[p + "final_layer_norm.bias"],
            "up_w": flat[p + "fc1.weight"],
            "up_b": flat[p + "fc1.bias"],
            "down_w": flat[p + "fc2.weight"],
            "down_b": flat[p + "fc2.bias"],
        })
    return ap, acfg


def load_mmproj_audio_gguf(path: Union[str, Path]
                           ) -> Tuple[Dict[str, Any], AudioConfig]:
    """Audio tower + projector from an mmproj GGUF (export/mmproj.py
    WhisperAudioMmproj output, a.*/mm.a.* names)."""
    from ..formats.gguf import GGUFReader

    r = GGUFReader(path)
    proj = r.get("clip.projector_type")
    if proj not in ("qwen2a", "voxtral"):
        raise NotImplementedError(
            f"audio serving supports qwen2a/voxtral projectors, got {proj!r}")
    acfg = AudioConfig(
        d_model=int(r.get("clip.audio.embedding_length")),
        intermediate_size=int(r.get("clip.audio.feed_forward_length")),
        num_hidden_layers=int(r.get("clip.audio.block_count")),
        num_attention_heads=int(r.get("clip.audio.attention.head_count")),
        num_mel_bins=int(r.get("clip.audio.num_mel_bins")),
        layer_norm_eps=float(
            r.get("clip.audio.attention.layer_norm_epsilon", 1e-5)),
        projector=proj,
        stack_factor=int(r.get("clip.audio.projector.stack_factor", 4)),
    )

    def t(name):
        return jnp.asarray(r.tensor_float(name))

    ap: Dict[str, Any] = {
        "conv1_w": t("a.conv1d.1.weight"),
        "conv1_b": t("a.conv1d.1.bias").reshape(-1),  # packed with [:, None]
        "conv2_w": t("a.conv1d.2.weight"),
        "conv2_b": t("a.conv1d.2.bias").reshape(-1),
        "pos_embd": t("a.position_embd.weight"),
        "post_ln_w": t("a.post_ln.weight"),
        "post_ln_b": t("a.post_ln.bias"),
        "layers": [],
    }
    if proj == "voxtral":
        ap["proj_w"] = t("mm.a.mlp.1.weight")
        ap["proj2_w"] = t("mm.a.mlp.2.weight")
    else:
        ap["proj_w"] = t("mm.a.fc.weight")
        ap["proj_b"] = t("mm.a.fc.bias")
    for i in range(acfg.num_hidden_layers):
        p = f"a.blk.{i}."
        ap["layers"].append({
            "q_w": t(p + "attn_q.weight"), "q_b": t(p + "attn_q.bias"),
            "k_w": t(p + "attn_k.weight"),
            "v_w": t(p + "attn_v.weight"), "v_b": t(p + "attn_v.bias"),
            "o_w": t(p + "attn_out.weight"), "o_b": t(p + "attn_out.bias"),
            "ln1_w": t(p + "ln1.weight"), "ln1_b": t(p + "ln1.bias"),
            "ln2_w": t(p + "ln2.weight"), "ln2_b": t(p + "ln2.bias"),
            "up_w": t(p + "ffn_up.weight"), "up_b": t(p + "ffn_up.bias"),
            "down_w": t(p + "ffn_down.weight"),
            "down_b": t(p + "ffn_down.bias"),
        })
    return ap, acfg


def generate_with_audio(
    params, cfg: LlamaConfig, ap, acfg: AudioConfig,
    input_ids: np.ndarray, mel: np.ndarray, audio_token_id: int,
    max_new_tokens: int = 32, eos_token_id: Optional[int] = None,
    max_len: Optional[int] = None,
) -> List[int]:
    """Greedy generation with audio soft tokens spliced at the audio-token
    positions. mel: (n_clips, mel_bins, T) log-mel features."""
    soft = audio_soft_tokens(ap, acfg, jnp.asarray(mel))
    return vlm.generate_with_soft_tokens(
        params, cfg, input_ids, soft, audio_token_id,
        max_new_tokens=max_new_tokens, eos_token_id=eos_token_id,
        max_len=max_len)
