"""Sharded GGUF split/merge/read (llama.cpp gguf-split equivalent)."""

import numpy as np
import pytest
import torch
import jax.numpy as jnp

from gptq_gguf_tpu.export import packer
from gptq_gguf_tpu.formats.gguf import GGUFReader
from gptq_gguf_tpu.mapper import shards
from gptq_gguf_tpu.serving import model as qmodel

RNG = np.random.default_rng(57)


@pytest.fixture(scope="module")
def gguf(tmp_path_factory):
    from transformers import AutoConfig, AutoModelForCausalLM

    tmp = tmp_path_factory.mktemp("shards")
    cfg = AutoConfig.for_model(
        model_type="llama", vocab_size=96, hidden_size=48,
        intermediate_size=96, num_hidden_layers=2, num_attention_heads=4,
        num_key_value_heads=2, max_position_embeddings=256,
        torch_dtype="float32")
    torch.manual_seed(51)
    m = AutoModelForCausalLM.from_config(cfg).eval().float()
    d = tmp / "m"
    m.save_pretrained(d, safe_serialization=True)
    out = tmp / "m.gguf"
    packer.pack_model(d, tmp / "none", out)
    return out, tmp


def test_split_read_merge_roundtrip(gguf):
    src, tmp = gguf
    paths = shards.split_gguf_file(src, tmp / "m", max_tensors=5)
    assert len(paths) >= 3
    assert paths[0].name == "m-00001-of-%05d.gguf" % len(paths)
    # shard 1 carries full metadata; shard 2 only the split keys
    r1 = GGUFReader(paths[0])
    assert r1.get("general.architecture") == "llama"
    assert r1.get("split.no") == 0
    assert r1.get("split.count") == len(paths)
    r2 = GGUFReader(paths[1])
    assert r2.get("general.architecture") is None
    assert r2.get("split.no") == 1
    # set reader sees everything
    full = GGUFReader(src)
    s = shards.open_gguf(paths[0])
    assert isinstance(s, shards.GGUFSetReader)
    assert s.tensor_order == full.tensor_order
    assert s.get("general.architecture") == "llama"
    for n in ("token_embd.weight", "blk.1.ffn_down.weight"):
        np.testing.assert_array_equal(s.tensor_float(n), full.tensor_float(n))
    # merge reproduces the tensor payloads
    merged = shards.merge_gguf_files(paths[0], tmp / "merged.gguf")
    rm = GGUFReader(merged)
    assert rm.tensor_order == full.tensor_order
    assert rm.get("split.count") is None
    np.testing.assert_array_equal(
        rm.tensor_float("blk.0.attn_q.weight"),
        full.tensor_float("blk.0.attn_q.weight"))


def test_split_by_size_and_metadata_only_first(gguf):
    src, tmp = gguf
    paths = shards.split_gguf_file(src, tmp / "sz", max_size=64 * 1024,
                                   no_tensor_first_split=True)
    r1 = GGUFReader(paths[0])
    assert len(r1.tensors) == 0  # --no-tensor-first-split
    s = shards.open_gguf(paths[0])
    assert len(s.tensor_order) == len(GGUFReader(src).tensor_order)


def test_serving_loads_sharded_set(gguf):
    """load_gguf_for_serving on the first shard == on the whole file."""
    src, tmp = gguf
    paths = shards.split_gguf_file(src, tmp / "serve", max_tensors=4)
    p_full, c_full = qmodel.load_gguf_for_serving(src, dtype=jnp.float32)
    p_set, c_set = qmodel.load_gguf_for_serving(paths[0], dtype=jnp.float32)
    assert c_set == c_full
    ids = RNG.integers(0, 96, size=(1, 8))
    cache_a = qmodel.init_cache(c_full, 1, 16, dtype=jnp.float32)
    cache_b = qmodel.init_cache(c_set, 1, 16, dtype=jnp.float32)
    la, _ = qmodel.forward_cached(p_full, c_full, jnp.asarray(ids), cache_a)
    lb, _ = qmodel.forward_cached(p_set, c_set, jnp.asarray(ids), cache_b)
    np.testing.assert_array_equal(np.asarray(la), np.asarray(lb))


def test_incomplete_set_errors(gguf):
    src, tmp = gguf
    paths = shards.split_gguf_file(src, tmp / "bad", max_tensors=6)
    paths[-1].unlink()
    with pytest.raises(FileNotFoundError, match="incomplete"):
        shards.open_gguf(paths[0])


def test_gguf_split_cli(gguf):
    from gptq_gguf_tpu.__main__ import main

    src, tmp = gguf
    rc = main(["gguf-split", "--input", str(src), "--output",
               str(tmp / "cli"), "--split-max-size", "64K"])
    assert not rc
    first = sorted(tmp.glob("cli-00001-of-*.gguf"))[0]
    rc = main(["gguf-split", "--merge", "--input", str(first),
               "--output", str(tmp / "cli-merged.gguf")])
    assert not rc
    assert (GGUFReader(tmp / "cli-merged.gguf").tensor_order
            == GGUFReader(src).tensor_order)
