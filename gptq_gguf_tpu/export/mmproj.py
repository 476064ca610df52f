"""Vision-encoder (mmproj) GGUF packer.

The reference converter's MmprojModel wing (pack_gptq_into_gguf.py
:1308-1437 base, Gemma3VisionModel, Qwen2VLVisionModel :5155-5229,
LlavaVisionModel pixtral branch) writes the vision tower + multimodal
projector of a VLM checkpoint into a separate GGUF with architecture
"clip" and ``general.type = "mmproj"`` that llama.cpp's mtmd loads
alongside the text model. This module is the TPU-repo equivalent: pure
numpy tensor relayout driven by per-family specs, reusing the streaming
GGUFWriter.

Projector families covered: gemma3 (SigLIP + input projection),
qwen2_vl / qwen2_5_vl (ViT merger, fused qkv split, Conv3D patch split,
window-attention pattern), pixtral (Mistral-3/Pixtral GQA-free ViT with
2D rope and patch merger), idefics3/smolvlm, lfm2-vl, whisper-family
audio (qwen2-audio/ultravox/voxtral), qwen2.5-omni (vision+audio),
internvl / intern-s1, llama4, and kimi-vl.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Any, Dict, List, Optional, Tuple, Union

import numpy as np

from ..formats.gguf import GGUFWriter

__all__ = ["pack_mmproj", "MMPROJ_REGISTRY"]

# SigLIP/CLIP-style encoder layer map (HF vision_model.encoder.layers.N.*)
_CLIP_LAYER = {
    "self_attn.q_proj": "attn_q",
    "self_attn.k_proj": "attn_k",
    "self_attn.v_proj": "attn_v",
    "self_attn.out_proj": "attn_out",
    "layer_norm1": "ln1",
    "layer_norm2": "ln2",
    "mlp.fc1": "ffn_up",
    "mlp.fc2": "ffn_down",
}


class MmprojSpec:
    """Per-family conversion: vision hparams + tensor relayout."""

    projector_type = "mlp"

    def __init__(self, cfg: Dict[str, Any], model_dir: Path):
        self.global_cfg = cfg
        self.model_dir = model_dir
        self.vision = dict(self.vision_config(cfg))
        text = {**cfg, **(cfg.get("text_config") or {})}
        self.n_embd_text = text.get("hidden_size", text.get("n_embd", 0))
        pp = model_dir / "preprocessor_config.json"
        self.preprocessor = json.load(open(pp)) if pp.exists() else {}

    def vision_config(self, cfg) -> Dict[str, Any]:
        vc = cfg.get("vision_config")
        if vc is None:
            raise ValueError("vision_config not found in config.json")
        return vc

    # -- metadata -----------------------------------------------------------

    def metadata(self) -> Dict[str, Any]:
        v = self.vision
        md = {
            "general.architecture": "clip",
            "general.type": "mmproj",
            "general.name": self.global_cfg.get("_name_or_path", "model"),
            "general.quantization_version": 2,
            "clip.has_vision_encoder": True,
            "clip.projector_type": self.projector_type,
            "clip.vision.projection_dim": int(self.n_embd_text),
            "clip.vision.image_size": int(v["image_size"]),
            "clip.vision.patch_size": int(v["patch_size"]),
            "clip.vision.embedding_length": int(v["hidden_size"]),
            "clip.vision.feed_forward_length": int(v["intermediate_size"]),
            "clip.vision.block_count": int(
                v.get("num_hidden_layers", v.get("depth"))),
            "clip.vision.attention.head_count": int(
                v.get("num_attention_heads", v.get("num_heads"))),
        }
        if self.preprocessor.get("image_mean") is not None:
            md["clip.vision.image_mean"] = [
                float(x) for x in self.preprocessor["image_mean"]]
            md["clip.vision.image_std"] = [
                float(x) for x in self.preprocessor["image_std"]]
        return md

    # -- tensors ------------------------------------------------------------

    def convert(self, name: str, arr: np.ndarray
                ) -> List[Tuple[str, np.ndarray]]:
        """One HF tensor -> zero or more (gguf_name, array) pairs."""
        raise NotImplementedError

    def force_f32(self, gguf_name: str) -> bool:
        """Small/sensitive tensors stay f32 (reference tensor_force_quant)."""
        return ".position_embd." in gguf_name or gguf_name.endswith(
            ("class_embd", ".bias")) or "_norm" in gguf_name or (
            ".ln" in gguf_name)


def _clip_tower(name: str) -> Optional[str]:
    """vision_model.* (CLIP/SigLIP) -> v.* GGUF names."""
    fixed = {
        "embeddings.patch_embedding.weight": "v.patch_embd.weight",
        "embeddings.patch_embedding.bias": "v.patch_embd.bias",
        "embeddings.position_embedding.weight": "v.position_embd.weight",
        "embeddings.class_embedding": "v.class_embd",
        "pre_layrnorm.weight": "v.pre_ln.weight",
        "pre_layrnorm.bias": "v.pre_ln.bias",
        "post_layernorm.weight": "v.post_ln.weight",
        "post_layernorm.bias": "v.post_ln.bias",
    }
    if name in fixed:
        return fixed[name]
    if name.startswith("encoder.layers."):
        parts = name.split(".")
        i = parts[2]
        head, kind = ".".join(parts[3:-1]), parts[-1]
        if head in _CLIP_LAYER:
            return f"v.blk.{i}.{_CLIP_LAYER[head]}.{kind}"
    return None


class Gemma3Mmproj(MmprojSpec):
    """Gemma-3 SigLIP tower + input projection (reference
    Gemma3VisionModel): soft_emb_norm carries the (1+w) Gemma RMSNorm
    correction; projector scale factor only written for test geometries."""

    projector_type = "gemma3"

    def metadata(self):
        md = super().metadata()
        v = self.vision
        md["clip.vision.attention.layer_norm_epsilon"] = float(
            v.get("layer_norm_eps", 1e-6))
        md["clip.use_gelu"] = True
        seq = int(self.preprocessor.get("image_seq_length", 256))
        n_per_side = int(seq ** 0.5)
        scale = (v["image_size"] // v["patch_size"]) // n_per_side
        if scale > 0 and scale != 4:
            md["clip.vision.projector.scale_factor"] = int(scale)
        return md

    def convert(self, name, arr):
        if "vision_model.head." in name:
            return []
        if name.startswith("multi_modal_projector."):
            rest = name[len("multi_modal_projector."):].replace(
                "_weight", ".weight")
            if rest == "mm_input_projection.weight":
                return [("mm.input_projection.weight", arr)]
            if rest == "mm_soft_emb_norm.weight":
                return [("mm.soft_emb_norm.weight", arr + 1.0)]
            return []
        for pre in ("vision_tower.vision_model.", "vision_model."):
            if name.startswith(pre):
                g = _clip_tower(name[len(pre):])
                return [(g, arr)] if g else []
        return []


class Qwen2VLMmproj(MmprojSpec):
    """Qwen2-VL ViT + merger (reference Qwen2VLVisionModel :5155-5229):
    fused qkv split three ways, the temporal Conv3D patch embedding split
    into two Conv2D planes, merger.ln_q as the post norm."""

    projector_type = "qwen2vl_merger"

    def __init__(self, cfg, model_dir):
        super().__init__(cfg, model_dir)
        v = self.vision
        v.setdefault("image_size", 560)
        v["num_attention_heads"] = v.get("num_heads")
        v["num_hidden_layers"] = v.get("depth")
        if "embed_dim" in v:  # qwen2vl key scheme
            v["intermediate_size"] = v.get("hidden_size")
            v["hidden_size"] = v.get("embed_dim")

    _blk = {
        "attn.proj": "attn_out",
        "norm1": "ln1",
        "norm2": "ln2",
        "mlp.fc1": "ffn_up",
        "mlp.fc2": "ffn_down",
        "mlp.gate_proj": "ffn_gate",
        "mlp.up_proj": "ffn_up",
        "mlp.down_proj": "ffn_down",
        "attn.q": "attn_q", "attn.k": "attn_k", "attn.v": "attn_v",
    }

    def metadata(self):
        md = super().metadata()
        md["clip.vision.attention.layer_norm_epsilon"] = float(
            self.global_cfg.get("rms_norm_eps", 1e-6))
        mt = self.global_cfg.get("model_type")
        if mt in ("qwen2_5_vl", "qwen2_5_omni"):
            md["clip.projector_type"] = "qwen2.5vl_merger"
            md["clip.use_silu"] = True
            md["clip.vision.window_size"] = int(
                self.vision.get("window_size", 112))
            fab = self.vision.get("fullatt_block_indexes")
            if fab:
                n_wa = fab[0] + 1
                for a, b in zip(fab, fab[1:]):
                    if b - a != n_wa:
                        raise ValueError(
                            f"invalid fullatt_block_indexes: {fab}")
                md["clip.vision.n_wa_pattern"] = int(n_wa)
        return md

    def convert(self, name, arr):
        if not name.startswith("visual."):
            return []
        rest = name[len("visual."):]
        if ".qkv." in rest:
            c = arr.shape[0] // 3
            parts = ("q", "k", "v")
            return [(self.convert(
                "visual." + rest.replace("qkv", p), arr[j * c:(j + 1) * c])[0])
                for j, p in enumerate(parts)]
        if rest == "patch_embed.proj.weight":
            assert arr.shape[2] == 2, "temporal_patch_size must be 2"
            return [("v.patch_embd.weight", np.ascontiguousarray(arr[:, :, 0])),
                    ("v.patch_embd.weight.1", np.ascontiguousarray(arr[:, :, 1]))]
        if rest == "merger.ln_q.weight":
            return [("v.post_ln.weight", arr)]
        if rest == "merger.ln_q.bias":
            return [("v.post_ln.bias", arr)]
        if rest.startswith("merger.mlp."):
            parts = rest.split(".")
            return [(f"mm.{parts[2]}.{parts[3]}", arr)]
        if rest.startswith("blocks."):
            parts = rest.split(".")
            i = parts[1]
            head, kind = ".".join(parts[2:-1]), parts[-1]
            if head in self._blk:
                return [(f"v.blk.{i}.{self._blk[head]}.{kind}", arr)]
        return []


class PixtralMmproj(MmprojSpec):
    """Pixtral / Mistral-Small-3.1 vision tower (reference
    LlavaVisionModel pixtral branch): GQA-free ViT with RMS norms, silu
    MLP, patch merger and the mm.1/mm.2 projector."""

    projector_type = "pixtral"

    _blk = {
        "attention.q_proj": "attn_q",
        "attention.k_proj": "attn_k",
        "attention.v_proj": "attn_v",
        "attention.o_proj": "attn_out",
        "attention_norm": "ln1",
        "ffn_norm": "ln2",
        "feed_forward.gate_proj": "ffn_gate",
        "feed_forward.up_proj": "ffn_up",
        "feed_forward.down_proj": "ffn_down",
    }

    def metadata(self):
        md = super().metadata()
        v = self.vision
        md["clip.vision.attention.layer_norm_epsilon"] = float(
            v.get("layer_norm_eps", 1e-5))
        act = v.get("hidden_act", "silu")
        if act == "silu":
            md["clip.use_silu"] = True
        elif act == "gelu":
            md["clip.use_gelu"] = True
        else:
            raise ValueError(f"unsupported hidden_act {act!r}")
        if "spatial_merge_size" in self.global_cfg:
            md["clip.vision.spatial_merge_size"] = int(
                self.global_cfg["spatial_merge_size"])
        return md

    def convert(self, name, arr):
        fixed = {
            "vision_tower.patch_conv.weight": "v.patch_embd.weight",
            "vision_tower.ln_pre.weight": "v.pre_ln.weight",
            "multi_modal_projector.linear_1.weight": "mm.1.weight",
            "multi_modal_projector.linear_1.bias": "mm.1.bias",
            "multi_modal_projector.linear_2.weight": "mm.2.weight",
            "multi_modal_projector.linear_2.bias": "mm.2.bias",
            "multi_modal_projector.norm.weight": "mm.input_norm.weight",
            "multi_modal_projector.patch_merger.merging_layer.weight":
                "mm.patch_merger.weight",
        }
        if name in fixed:
            return [(fixed[name], arr)]
        if name.startswith("vision_tower.transformer.layers."):
            parts = name.split(".")
            i = parts[3]
            head, kind = ".".join(parts[4:-1]), parts[-1]
            if head in self._blk:
                return [(f"v.blk.{i}.{self._blk[head]}.{kind}", arr)]
        return []


class Idefics3Mmproj(MmprojSpec):
    """SmolVLM / Idefics3 SigLIP tower + modality projection (reference
    SmolVLMModel :2399-2429)."""

    projector_type = "idefics3"

    def __init__(self, cfg, model_dir):
        super().__init__(cfg, model_dir)
        v = self.vision  # SmolVLM2 ships without these keys
        v.setdefault("hidden_size", 1152)
        v.setdefault("num_attention_heads", 16)
        v.setdefault("intermediate_size", 3072)

    def metadata(self):
        md = super().metadata()
        md["clip.vision.attention.layer_norm_epsilon"] = float(
            self.vision.get("layer_norm_eps", 1e-5))
        md["clip.vision.projector.scale_factor"] = int(
            self.global_cfg.get("scale_factor", 2))
        md["clip.use_gelu"] = True
        return md

    def convert(self, name, arr):
        if name.startswith("model.connector.modality_projection.proj"):
            kind = name.rsplit(".", 1)[1]
            return [(f"mm.model.fc.{kind}", arr)]
        for pre in ("model.vision_model.", "vision_model.",
                    "vision_tower.vision_model."):
            if name.startswith(pre):
                g = _clip_tower(name[len(pre):])
                return [(g, arr)] if g else []
        return []


class Lfm2VlMmproj(MmprojSpec):
    """LFM2-VL SigLIP2 tower + pixel-unshuffle projector (reference
    LFM2VLModel :8483-8517): fixed image_size 256 for dynamic resolution,
    downsample_factor scale, feature-layer-trimmed block count."""

    projector_type = "lfm2"

    def __init__(self, cfg, model_dir):
        super().__init__(cfg, model_dir)
        self.vision.setdefault("image_size", 256)

    def metadata(self):
        md = super().metadata()
        v = self.vision
        md["clip.vision.attention.layer_norm_epsilon"] = float(
            v.get("layer_norm_eps", 1e-6))
        md["clip.vision.projector.scale_factor"] = int(
            self.global_cfg.get("downsample_factor", 2))
        md["clip.use_gelu"] = True
        # vision_feature_layer == -1 keeps all blocks (reference :8516)
        drop = -(int(self.global_cfg.get("vision_feature_layer", -1)) + 1)
        md["clip.vision.block_count"] = int(
            v.get("num_hidden_layers", v.get("depth"))) - drop
        return md

    def convert(self, name, arr):
        proj = {
            "multi_modal_projector.layer_norm.weight": "mm.input_norm.weight",
            "multi_modal_projector.layer_norm.bias": "mm.input_norm.bias",
            "multi_modal_projector.linear_1.weight": "mm.1.weight",
            "multi_modal_projector.linear_1.bias": "mm.1.bias",
            "multi_modal_projector.linear_2.weight": "mm.2.weight",
            "multi_modal_projector.linear_2.bias": "mm.2.bias",
        }
        if name in proj:
            return [(proj[name], arr)]
        for pre in ("vision_tower.vision_model.", "vision_tower."):
            if name.startswith(pre):
                g = _clip_tower(name[len(pre):])
                return [(g, arr)] if g else []
        return []


class InternVLMmproj(MmprojSpec):
    """InternViT tower + mlp1 projector (reference InternVisionModel
    pack_gptq_into_gguf.py:3505-3578): fused attn.qkv split three ways,
    ls1/ls2 layer scales (".weight" appended), optional q/k norms, the
    Intern-S1 "model.multi_modal_projector.*" -> mlp1.* aliasing, and
    projector scale factor 1/downsample_ratio."""

    projector_type = "internvl"

    _blk = {
        "attn.proj": "attn_out",
        "attn.q_norm": "attn_q_norm",
        "attn.k_norm": "attn_k_norm",
        "norm1": "ln1",
        "norm2": "ln2",
        "mlp.fc1": "ffn_up",
        "mlp.fc2": "ffn_down",
        "ls1": "ls1",
        "ls2": "ls2",
        "self_attn.q_proj": "attn_q",
        "self_attn.k_proj": "attn_k",
        "self_attn.v_proj": "attn_v",
    }
    # Intern-S1 ships the projector under HF-style names (reference
    # _mapping_interns1_name :3536-3547; pack_mmproj strips the "model.")
    _interns1 = {
        "multi_modal_projector.layer_norm": "mlp1.0",
        "multi_modal_projector.linear_1": "mlp1.1",
        "multi_modal_projector.linear_2": "mlp1.3",
    }

    def vision_config(self, cfg):
        vc = super().vision_config(cfg)
        for k in ("image_size", "patch_size"):  # list-valued on InternViT
            if isinstance(vc.get(k), list):
                vc = {**vc, k: vc[k][0]}
        return vc

    def metadata(self):
        md = super().metadata()
        v = self.vision
        md["clip.vision.attention.layer_norm_epsilon"] = float(
            v.get("layer_norm_eps", 1e-6))
        act = v.get("hidden_act", "gelu")
        if act == "silu":
            md["clip.use_silu"] = True
        elif act == "gelu":
            md["clip.use_gelu"] = True
        else:
            raise ValueError(f"unsupported hidden_act {act!r}")
        ratio = self.global_cfg.get("downsample_ratio")
        if ratio:
            md["clip.vision.projector.scale_factor"] = int(round(1.0 / ratio))
        return md

    def convert(self, name, arr):
        head, _, kind = name.rpartition(".")
        if head in self._interns1:
            name = f"{self._interns1[head]}.{kind}"
        if name.startswith("mlp1."):
            _, bid, kind = name.split(".")
            return [(f"mm.model.mlp.{bid}.{kind}", arr)]
        for pre in ("vision_model.", "vision_tower."):
            if name.startswith(pre):
                rest = name[len(pre):]
                break
        else:
            return []
        fixed = {
            "embeddings.class_embedding": "v.class_embd",
            "embeddings.patch_embedding.weight": "v.patch_embd.weight",
            "embeddings.patch_embedding.bias": "v.patch_embd.bias",
            "embeddings.position_embedding": "v.position_embd.weight",
        }
        if rest in fixed:
            if rest.endswith("position_embedding"):   # [1, N, C] -> [N, C]
                arr = arr.reshape(arr.shape[-2:])
            elif rest.endswith("class_embedding"):    # [1, 1, C] -> [C]
                arr = arr.reshape(-1)
            return [(fixed[rest], arr)]
        if rest.startswith("encoder.layers."):
            parts = rest.split(".")
            i = parts[2]
            tail = ".".join(parts[3:])
            if tail.partition(".")[0] in ("ls1", "ls2"):  # no .weight in HF
                tail = tail.partition(".")[0] + ".weight"
            head, _, kind = tail.rpartition(".")
            if head == "attn.qkv":
                c = arr.shape[0] // 3
                return [(f"v.blk.{i}.attn_{p}.{kind}", arr[j * c:(j + 1) * c])
                        for j, p in enumerate("qkv")]
            if head in self._blk:
                return [(f"v.blk.{i}.{self._blk[head]}.{kind}", arr)]
        return []


class Llama4Mmproj(MmprojSpec):
    """Llama-4 vision tower + pixel-shuffle adapter (reference
    Llama4VisionModel pack_gptq_into_gguf.py:2475-2494): unfold-linear
    patch embedding, positional_embedding_vlm (".weight" appended),
    vision_adapter MLP -> mm.model.mlp.{1,2}, multi_modal_projector
    linear_1 -> the single mm.model.fc despite the numbered name."""

    projector_type = "llama4"

    _blk = {
        "self_attn.q_proj": "attn_q",
        "self_attn.k_proj": "attn_k",
        "self_attn.v_proj": "attn_v",
        "self_attn.o_proj": "attn_out",
        "input_layernorm": "ln1",
        "post_attention_layernorm": "ln2",
        "mlp.fc1": "ffn_up",
        "mlp.fc2": "ffn_down",
    }

    def metadata(self):
        md = super().metadata()
        v = self.vision
        md["clip.vision.attention.layer_norm_epsilon"] = float(
            v.get("norm_eps", 1e-5))
        md["clip.vision.projector.scale_factor"] = int(
            round(1.0 / v.get("pixel_shuffle_ratio", 0.5)))
        if v.get("hidden_act", "gelu") != "gelu":
            raise ValueError("llama4 vision towers are gelu")
        md["clip.use_gelu"] = True
        return md

    def convert(self, name, arr):
        if name.startswith("multi_modal_projector.linear_1."):
            # single fully-connected layer despite the numbered name
            return [("mm.model.fc." + name.rsplit(".", 1)[1], arr)]
        if not name.startswith("vision_model."):
            return []
        rest = name[len("vision_model."):]
        fixed = {
            "class_embedding": "v.class_embd",
            "patch_embedding.linear.weight": "v.patch_embd.weight",
            "patch_embedding.linear.bias": "v.patch_embd.bias",
            "positional_embedding_vlm": "v.position_embd.weight",
            "layernorm_pre.weight": "v.pre_ln.weight",
            "layernorm_pre.bias": "v.pre_ln.bias",
            "layernorm_post.weight": "v.post_ln.weight",
            "layernorm_post.bias": "v.post_ln.bias",
        }
        if rest in fixed:
            return [(fixed[rest], arr)]
        if rest.startswith("vision_adapter.mlp.fc"):
            bid = rest.partition(".fc")[2][0]
            kind = rest.rsplit(".", 1)[1]
            return [(f"mm.model.mlp.{bid}.{kind}", arr)]
        if rest.startswith("model.layers."):
            parts = rest.split(".")
            i = parts[2]
            head, kind = ".".join(parts[3:-1]), parts[-1]
            if head in self._blk:
                return [(f"v.blk.{i}.{self._blk[head]}.{kind}", arr)]
        return []


class KimiVLMmproj(MmprojSpec):
    """Kimi-VL MoonViT tower + projector (reference KimiVLModel
    pack_gptq_into_gguf.py:8678-8713): fused wqkv chunked three ways,
    2D pos_emb flattened to (H*W, C), image_size pinned to 64*14 for
    compatibility, scale factor 2."""

    projector_type = "kimivl"

    _blk = {
        "wo": "attn_out",
        "norm0": "ln1",
        "norm1": "ln2",
        "mlp.fc0": "ffn_up",
        "mlp.fc1": "ffn_down",
    }

    def __init__(self, cfg, model_dir):
        super().__init__(cfg, model_dir)
        self.vision["image_size"] = 64 * 14  # reference :8683
        self.vision.setdefault("patch_size", 14)

    def metadata(self):
        md = super().metadata()
        md["clip.vision.attention.layer_norm_epsilon"] = float(
            self.vision.get("layer_norm_eps", 1e-5))
        md["clip.use_gelu"] = True
        md["clip.vision.projector.scale_factor"] = 2
        return md

    def convert(self, name, arr):
        proj = {
            "multi_modal_projector.pre_norm.weight": "mm.input_norm.weight",
            "multi_modal_projector.pre_norm.bias": "mm.input_norm.bias",
            "multi_modal_projector.linear_1.weight": "mm.1.weight",
            "multi_modal_projector.linear_1.bias": "mm.1.bias",
            "multi_modal_projector.linear_2.weight": "mm.2.weight",
            "multi_modal_projector.linear_2.bias": "mm.2.bias",
        }
        if name in proj:
            return [(proj[name], arr)]
        if not name.startswith("vision_tower."):
            return []
        rest = name[len("vision_tower."):]
        fixed = {
            "patch_embed.proj.weight": "v.patch_embd.weight",
            "patch_embed.proj.bias": "v.patch_embd.bias",
            "encoder.final_layernorm.weight": "v.post_ln.weight",
            "encoder.final_layernorm.bias": "v.post_ln.bias",
        }
        if rest in fixed:
            return [(fixed[rest], arr)]
        if rest == "patch_embed.pos_emb.weight":
            return [("v.position_embd.weight",
                     arr.reshape(arr.shape[0] * arr.shape[1], arr.shape[2]))]
        if rest.startswith("encoder.blocks."):
            parts = rest.split(".")
            i = parts[2]
            head, kind = ".".join(parts[3:-1]), parts[-1]
            if head == "wqkv":
                c = arr.shape[0] // 3
                return [(f"v.blk.{i}.attn_{p}.{kind}", arr[j * c:(j + 1) * c])
                        for j, p in enumerate("qkv")]
            if head in self._blk:
                return [(f"v.blk.{i}.{self._blk[head]}.{kind}", arr)]
        return []


class WhisperAudioMmproj(MmprojSpec):
    """Whisper-style audio encoders (reference WhisperEncoderModel /
    Ultravox / Voxtral :7893-7955): audio tower + the per-family
    projector; conv biases gain a trailing axis as upstream does."""

    projector_type = "qwen2a"
    has_vision = False

    def vision_config(self, cfg):
        ac = cfg.get("audio_config")
        if ac is None:
            raise ValueError("audio_config not found in config.json")
        ac = dict(ac)
        if "hidden_size" not in ac:
            ac["hidden_size"] = ac["d_model"]
            ac["intermediate_size"] = ac["encoder_ffn_dim"]
            ac["num_attention_heads"] = ac["encoder_attention_heads"]
        return ac

    def metadata(self):
        a = self.vision  # audio hparams
        md = {
            "general.architecture": "clip",
            "general.type": "mmproj",
            "general.name": self.global_cfg.get("_name_or_path", "model"),
            "general.quantization_version": 2,
            "clip.has_audio_encoder": True,
            "clip.projector_type": self.projector_type,
            "clip.audio.projection_dim": int(self.n_embd_text),
            "clip.audio.embedding_length": int(a["hidden_size"]),
            "clip.audio.feed_forward_length": int(a["intermediate_size"]),
            "clip.audio.block_count": int(
                a.get("encoder_layers", a.get("num_hidden_layers"))),
            "clip.audio.attention.head_count": int(a["num_attention_heads"]),
            "clip.audio.num_mel_bins": int(a["num_mel_bins"]),
            "clip.audio.attention.layer_norm_epsilon": float(
                a.get("layer_norm_eps", 1e-5)),
        }
        mt = self.global_cfg.get("model_type")
        if mt == "ultravox":
            md["clip.projector_type"] = "ultravox"
            md["clip.audio.projector.stack_factor"] = int(
                self.global_cfg["stack_factor"])
        elif mt == "voxtral":
            md["clip.projector_type"] = "voxtral"
            md["clip.audio.projector.stack_factor"] = 4
        return md

    _blk = {
        "self_attn.q_proj": "attn_q",
        "self_attn.k_proj": "attn_k",
        "self_attn.v_proj": "attn_v",
        "self_attn.out_proj": "attn_out",
        "self_attn_layer_norm": "ln1",
        "final_layer_norm": "ln2",
        "fc1": "ffn_up",
        "fc2": "ffn_down",
    }

    def convert(self, name, arr):
        if name.startswith("language_model."):
            return []
        if name.startswith("multi_modal_projector."):
            rest = name[len("multi_modal_projector."):]
            proj = {
                "linear.weight": "mm.a.fc.weight",
                "linear.bias": "mm.a.fc.bias",
                "linear_1.weight": "mm.a.mlp.1.weight",
                "linear_1.bias": "mm.a.mlp.1.bias",
                "linear_2.weight": "mm.a.mlp.2.weight",
                "linear_2.bias": "mm.a.mlp.2.bias",
                "ln_pre.weight": "mm.a.norm_pre.weight",
                "ln_pre.bias": "mm.a.norm_pre.bias",
                "ln_mid.weight": "mm.a.norm_mid.weight",
                "ln_mid.bias": "mm.a.norm_mid.bias",
            }
            return [(proj[rest], arr)] if rest in proj else []
        if not name.startswith("audio_tower."):
            return []
        rest = name[len("audio_tower."):]
        fixed = {
            "conv1.weight": "a.conv1d.1.weight",
            "conv1.bias": "a.conv1d.1.bias",
            "conv2.weight": "a.conv1d.2.weight",
            "conv2.bias": "a.conv1d.2.bias",
            "embed_positions.weight": "a.position_embd.weight",
            "layer_norm.weight": "a.post_ln.weight",
            "layer_norm.bias": "a.post_ln.bias",
        }
        if rest in fixed:
            if rest in ("conv1.bias", "conv2.bias"):
                arr = arr[:, None]  # reference transposes conv biases
            return [(fixed[rest], arr)]
        if rest.startswith("layers."):
            parts = rest.split(".")
            i = parts[1]
            head, kind = ".".join(parts[2:-1]), parts[-1]
            if head in self._blk:
                return [(f"a.blk.{i}.{self._blk[head]}.{kind}", arr)]
        return []


class Qwen25OmniMmproj(Qwen2VLMmproj):
    """Qwen2.5-Omni thinker (reference Qwen25OmniModel :5232-5288): dual
    vision+audio mmproj — qwen2.5 ViT plus a whisper-style audio tower
    whose sinusoid position embedding is generated at pack time."""

    def vision_config(self, cfg):
        vc = (cfg.get("thinker_config") or {}).get("vision_config")
        if vc is None:
            raise ValueError("thinker_config.vision_config not found")
        return vc

    def _audio(self) -> Dict[str, Any]:
        ac = dict((self.global_cfg.get("thinker_config") or {})
                  .get("audio_config") or {})
        if "hidden_size" not in ac and "d_model" in ac:
            ac["hidden_size"] = ac["d_model"]
            ac["intermediate_size"] = ac["encoder_ffn_dim"]
            ac["num_attention_heads"] = ac["encoder_attention_heads"]
        return ac

    def metadata(self):
        # the vision branch keys off model_type == qwen2_5_omni
        md = super().metadata()
        md["clip.projector_type"] = "qwen2.5o"
        md["clip.use_silu"] = True
        a = self._audio()
        md.update({
            "clip.has_audio_encoder": True,
            "clip.audio.projection_dim": int(self.n_embd_text),
            "clip.audio.embedding_length": int(a["hidden_size"]),
            "clip.audio.feed_forward_length": int(a["intermediate_size"]),
            "clip.audio.block_count": int(
                a.get("encoder_layers", a.get("num_hidden_layers"))),
            "clip.audio.attention.head_count": int(a["num_attention_heads"]),
            "clip.audio.num_mel_bins": int(a["num_mel_bins"]),
            "clip.audio.attention.layer_norm_epsilon": float(
                a.get("layer_norm_eps", 1e-5)),
        })
        return md

    def extra_tensors(self):
        # SinusoidsPositionEmbedding (reference :5256-5265)
        channels = int(self._audio()["hidden_size"])
        length, max_timescale = 1500, 10000
        inc = np.log(max_timescale) / (channels // 2 - 1)
        inv = np.exp(-inc * np.arange(channels // 2, dtype=np.float32))
        t = np.arange(length, dtype=np.float32)[:, None] * inv[None, :]
        pos = np.concatenate([np.sin(t), np.cos(t)], axis=1).astype(np.float32)
        return [("a.position_embd.weight", pos)]

    _audio_blk = WhisperAudioMmproj._blk

    def convert(self, name, arr):
        if name.startswith("thinker."):
            name = name[len("thinker."):]
        if name.startswith("audio_tower."):
            rest = name[len("audio_tower."):]
            if "audio_bos_eos_token" in rest:
                return []  # unused upstream (reference :5274)
            fixed = {
                "conv1.weight": "a.conv1d.1.weight",
                "conv1.bias": "a.conv1d.1.bias",
                "conv2.weight": "a.conv1d.2.weight",
                "conv2.bias": "a.conv1d.2.bias",
                "ln_post.weight": "a.post_ln.weight",
                "ln_post.bias": "a.post_ln.bias",
                "layer_norm.weight": "a.post_ln.weight",
                "layer_norm.bias": "a.post_ln.bias",
                "proj.weight": "mm.a.fc.weight",
                "proj.bias": "mm.a.fc.bias",
            }
            if rest in fixed:
                if rest in ("conv1.bias", "conv2.bias"):
                    arr = arr[:, None]
                return [(fixed[rest], arr)]
            if rest.startswith("layers."):
                parts = rest.split(".")
                i = parts[1]
                head, kind = ".".join(parts[2:-1]), parts[-1]
                if head in self._audio_blk:
                    return [(f"a.blk.{i}.{self._audio_blk[head]}.{kind}", arr)]
            return []
        return super().convert(name, arr)


MMPROJ_REGISTRY: Dict[str, type] = {
    "gemma3": Gemma3Mmproj,
    "qwen2_vl": Qwen2VLMmproj,
    "qwen2_5_vl": Qwen2VLMmproj,
    "pixtral": PixtralMmproj,
    "mistral3": PixtralMmproj,
    "llava": PixtralMmproj,  # reference LlavaVisionModel supports pixtral
    "idefics3": Idefics3Mmproj,
    "smolvlm": Idefics3Mmproj,
    "qwen2_audio": WhisperAudioMmproj,
    "ultravox": WhisperAudioMmproj,
    "voxtral": WhisperAudioMmproj,
    "lfm2_vl": Lfm2VlMmproj,
    "lfm2-vl": Lfm2VlMmproj,
    "qwen2_5_omni": Qwen25OmniMmproj,
    "internvl": InternVLMmproj,
    "internvl_chat": InternVLMmproj,
    "interns1": InternVLMmproj,
    "llama4": Llama4Mmproj,
    "kimi_vl": KimiVLMmproj,
}


def pack_mmproj(model_dir: Union[str, Path], out_path: Union[str, Path],
                *, use_f32: bool = False) -> Path:
    """Write the vision tower + projector of a VLM checkpoint as an mmproj
    GGUF (reference --mmproj mode of pack_gptq_into_gguf.py)."""
    from ..models.loader import _iter_safetensors, _to_f32

    model_dir = Path(model_dir)
    with open(model_dir / "config.json") as f:
        cfg = json.load(f)
    mt = cfg.get("model_type", "")
    spec_cls = MMPROJ_REGISTRY.get(mt)
    if spec_cls is None and isinstance(cfg.get("vision_config"), dict):
        spec_cls = MMPROJ_REGISTRY.get(cfg["vision_config"].get("model_type", ""))
    if spec_cls is None:
        raise NotImplementedError(
            f"no mmproj support for model_type {mt!r}")
    spec = spec_cls(cfg, model_dir)

    writer = GGUFWriter(out_path)
    for k, v in spec.metadata().items():
        writer.add_kv(k, v)
    for ename, earr in getattr(spec, "extra_tensors", lambda: [])():
        writer.add_tensor(ename, earr.astype(np.float32))
    n = 0
    for name, arr in _iter_safetensors(model_dir):
        # new transformers layouts nest the towers under a bare "model."
        # (model.vision_tower.*); the converters expect the classic names
        if name.startswith("model.") and name.split(".")[1] in (
                "vision_tower", "vision_model", "visual",
                "multi_modal_projector", "audio_tower", "connector"):
            name = name[len("model."):]
            if name.startswith("connector."):
                name = "model." + name  # idefics3 keys keep model.connector
        for gname, out in spec.convert(name, _to_f32(np.asarray(arr))):
            if use_f32 or out.ndim != 2 or spec.force_f32(gname):
                writer.add_tensor(gname, out.astype(np.float32))
            else:
                writer.add_tensor(gname, out.astype(np.float16))
            n += 1
    if n == 0:
        raise ValueError(f"no vision tensors found in {model_dir}")
    writer.write()
    return Path(out_path)
