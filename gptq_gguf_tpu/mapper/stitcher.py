"""Per-layer database + config -> stitched GGUF model.

TPU-framework equivalent of mapper/gguf_stitcher.py: discovers available
bitwidth variants per tensor, merges a user config (EvoPress output format)
with closest-match defaults, reconstructs raw GGML blocks from the database
bytes, copies original metadata preserving exact GGUF value types, and
recalculates general.file_type.
"""

from __future__ import annotations

import dataclasses
import json
import re
from pathlib import Path
from typing import Any, Dict, List, Optional, Tuple, Union

import numpy as np

from ..formats.gguf import GGUFValue, GGUFValueType, GGUFWriter
from ..formats.ggml import GGMLQuantizationType

_FILE_RE_TYPED = re.compile(r"^([\d.]+)-([^.]+)\.pth$")
_FILE_RE_PLAIN = re.compile(r"^([\d.]+)\.pth$")
_CONFIG_LINE_RE = re.compile(r"^([\d.]+)\s*\(([\d.]+-[^)]+\.pth)\)$")


@dataclasses.dataclass
class QuantizationConfig:
    bitwidth: float
    filename: Optional[str]
    quant_type: Optional[str]
    metadata: Dict[str, Any] = dataclasses.field(default_factory=dict)

    @property
    def filename_prefix(self) -> str:
        if self.filename:
            return self.filename[: -len(".pth")]
        return str(self.bitwidth)


def discover_layers(split_dir: Union[str, Path]) -> Dict[str, List[Dict[str, Any]]]:
    """Scan layer dirs for `<bits>[-QTYPE].pth` variants (gguf_stitcher.py:70-141)."""
    discovered: Dict[str, List[Dict[str, Any]]] = {}
    split_dir = Path(split_dir)
    for layer_dir in sorted(split_dir.rglob("*")):
        if not layer_dir.is_dir():
            continue
        configs = []
        for f in layer_dir.glob("*.pth"):
            m = _FILE_RE_TYPED.match(f.name)
            if m:
                configs.append(
                    {"bitwidth": float(m.group(1)), "filename": f.name, "quant_type": m.group(2)}
                )
                continue
            m = _FILE_RE_PLAIN.match(f.name)
            if m:
                configs.append(
                    {"bitwidth": float(m.group(1)), "filename": f.name, "quant_type": None}
                )
        if configs:
            discovered[str(layer_dir.relative_to(split_dir))] = configs
    return discovered


def find_best_match(
    configs: List[Dict[str, Any]], bitwidth: float, quant_type: Optional[str]
) -> Dict[str, Any]:
    """Exact (bw, type) -> exact bw -> closest bw with type -> closest
    (gguf_stitcher.py:143-168)."""
    if quant_type:
        for c in configs:
            if c["bitwidth"] == bitwidth and c["quant_type"] == quant_type:
                return c
    for c in configs:
        if c["bitwidth"] == bitwidth:
            return c
    by_dist = sorted(configs, key=lambda c: abs(c["bitwidth"] - bitwidth))
    if quant_type:
        for c in by_dist:
            if c["quant_type"] == quant_type:
                return c
    return by_dist[0]


def parse_config_file(
    path: Union[str, Path], available: Dict[str, List[Dict[str, Any]]]
) -> Dict[str, QuantizationConfig]:
    """Parse the `tensor: bitwidth (filename.pth)` text format and its
    simpler variants (gguf_stitcher.py:316-415)."""
    out: Dict[str, QuantizationConfig] = {}
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#") or ":" not in line:
                continue
            name, rest = line.split(":", 1)
            name, rest = name.strip(), rest.strip()
            m = _CONFIG_LINE_RE.match(rest)
            if m:
                bw, filename = float(m.group(1)), m.group(2)
                qm = _FILE_RE_TYPED.match(filename)
                qt = qm.group(2) if qm else None
                out[name] = QuantizationConfig(bw, filename, qt)
                continue
            parts = rest.split()
            try:
                bw = float(parts[0])
            except (ValueError, IndexError):
                continue
            qt = parts[1] if len(parts) > 1 else None
            if name in available:
                best = find_best_match(available[name], bw, qt)
                out[name] = QuantizationConfig(best["bitwidth"], best["filename"], best["quant_type"])
            else:
                fn = f"{parts[0]}-{qt}.pth" if qt else f"{parts[0]}.pth"
                out[name] = QuantizationConfig(bw, fn, qt)
    return out


# file_type recalculation (gguf_stitcher.py:644-674)
_FILE_TYPE_BY_BITS = {32: 0, 16: 1, 8: 7, 6: 14, 5: 13, 4: 12, 3: 11, 2: 10}


def calculate_file_type(config: Dict[str, QuantizationConfig]) -> int:
    counts: Dict[float, int] = {}
    for c in config.values():
        counts[c.bitwidth] = counts.get(c.bitwidth, 0) + 1
    if not counts:
        return 12
    dominant = max(counts, key=counts.get)
    if counts[dominant] / len(config) > 0.5:
        return _FILE_TYPE_BY_BITS.get(int(dominant), 12)
    return 12


class GGUFStitcher:
    """Assemble a GGUF from database layers (gguf_stitcher.py:44-976)."""

    def __init__(
        self,
        split_dir: Union[str, Path],
        config_path: Optional[Union[str, Path]] = None,
        default_bitwidth: float = 4.5,
        default_quant_type: Optional[str] = "Q4_K",
    ):
        self.split_dir = Path(split_dir)
        self.manifest = self._load_manifest()
        self.available = discover_layers(self.split_dir)
        user_cfg = (
            parse_config_file(config_path, self.available) if config_path else {}
        )
        self.config: Dict[str, QuantizationConfig] = {}
        for name, configs in self.available.items():
            if name in user_cfg:
                self.config[name] = user_cfg[name]
            else:
                best = find_best_match(configs, default_bitwidth, default_quant_type)
                self.config[name] = QuantizationConfig(
                    best["bitwidth"], best["filename"], best["quant_type"]
                )

    def _load_manifest(self) -> Dict[str, Any]:
        p = self.split_dir / "manifest.json"
        if p.exists():
            with open(p) as f:
                return json.load(f)
        return {}

    # -- validation modes (gguf_stitcher.py:877-976) -----------------------

    def validate(self) -> List[str]:
        """Check that every configured tensor file exists; returns problems."""
        problems = []
        if not self.available:
            problems.append(
                f"no layer directories with <bits>[-QTYPE].pth files found under {self.split_dir}"
            )
        for name, cfg in self.config.items():
            f = self.split_dir / name / (cfg.filename or f"{cfg.bitwidth}.pth")
            if not f.exists() and not (self.split_dir / name / "32-F32.pth").exists():
                problems.append(f"{name}: missing {f.name}")
            meta = self.split_dir / name / f"{cfg.filename_prefix}-metadata.json"
            if not meta.exists() and not (self.split_dir / name / "32-F32-metadata.json").exists():
                problems.append(f"{name}: missing metadata {meta.name}")
        return problems

    def list_tensors(self) -> Dict[str, Dict[str, Any]]:
        return {
            name: {"bitwidth": c.bitwidth, "quant_type": c.quant_type, "filename": c.filename}
            for name, c in self.config.items()
        }

    # -- stitching ---------------------------------------------------------

    def _load_tensor(self, name: str, cfg: QuantizationConfig) -> Tuple[np.ndarray, Dict[str, Any]]:
        layer_dir = self.split_dir / name
        f = layer_dir / (cfg.filename or f"{cfg.bitwidth}.pth")
        meta_f = layer_dir / f"{cfg.filename_prefix}-metadata.json"
        if not f.exists():
            # 32-F32 fallback (gguf_stitcher.py:592-608)
            fb = layer_dir / "32-F32.pth"
            if fb.exists():
                f = fb
                meta_f = layer_dir / "32-F32-metadata.json"
            else:
                raise FileNotFoundError(f"tensor file not found: {f}")
        with open(meta_f) as mf:
            meta = json.load(mf)
        info = meta["tensor_info"]
        data = np.frombuffer(f.read_bytes(), dtype=np.dtype(info["np_dtype"]))
        return data.reshape(tuple(info["np_shape"])), info

    def stitch(self, out_path: Union[str, Path]) -> Path:
        problems = self.validate()
        if problems:
            raise FileNotFoundError("; ".join(problems))
        writer = GGUFWriter(out_path)

        # metadata passthrough preserving exact types (gguf_stitcher.py:676-774)
        skip = {"general.file_type"}
        for key, entry in self.manifest.get("metadata", {}).items():
            if key in skip:
                continue
            types = entry.get("types") or []
            value = entry.get("value")
            if isinstance(value, str) and value.startswith("<serialization_error"):
                continue
            if not types:
                writer.add_kv(key, value)
                continue
            vtype = GGUFValueType(types[0])
            elem = GGUFValueType(types[1]) if len(types) > 1 and vtype == GGUFValueType.ARRAY else None
            if vtype == GGUFValueType.ARRAY and elem is None and isinstance(value, list) and value:
                elem = None  # infer in add_kv
            writer.add_kv(key, GGUFValue(vtype, value, elem_type=elem) if elem or vtype != GGUFValueType.ARRAY else value)
        writer.add_kv("general.file_type", calculate_file_type(self.config))

        # tensors in original model order when known
        order = list(self.manifest.get("layers", {}).keys()) or sorted(self.config)
        for name in order:
            if name not in self.config:
                continue
            cfg = self.config[name]
            data, info = self._load_tensor(name, cfg)
            ggml_type = GGMLQuantizationType(info["type"])
            ne = info["shape"]  # GGML order
            shape = tuple(reversed(ne))
            writer.add_tensor(name, data.view(np.uint8), raw_dtype=ggml_type, raw_shape=shape)
        writer.write()
        return Path(out_path)
