"""Data loaders, logging, distill utilities."""

import numpy as np
import pytest

import jax.numpy as jnp

from gptq_gguf_tpu.search import distill
from gptq_gguf_tpu.utils import data as data_mod
from gptq_gguf_tpu.utils.logging import StageTimer


def test_synthetic_data_deterministic():
    a = data_mod.get_data("synthetic", 1024, 64, vocab_size=100, train=True)
    b = data_mod.get_data("synthetic", 1024, 64, vocab_size=100, train=True)
    assert len(a) == 16
    assert all(x.shape == (1, 64) for x in a)
    np.testing.assert_array_equal(a[0], b[0])
    c = data_mod.get_data("synthetic", 1024, 64, vocab_size=100, train=False)
    assert not np.array_equal(a[0], c[0])
    assert max(x.max() for x in a) < 100


def test_token_file_loading(tmp_path):
    arr = np.arange(4 * 128).reshape(4, 128).astype(np.int64)
    np.save(tmp_path / "toks.npy", arr)
    out = data_mod.get_data(str(tmp_path / "toks.npy"), 2 * 64, 64)
    assert len(out) == 2 and out[0].shape == (1, 64)

    import torch

    torch.save([torch.arange(64)[None, :] for _ in range(3)], tmp_path / "toks.pth")
    out = data_mod.get_data(str(tmp_path / "toks.pth"), 3 * 32, 32)
    assert len(out) == 3 and out[0].shape == (1, 32)


def test_collect_samples_with_join():
    class FakeTok:
        def __call__(self, text, add_special_tokens=False):
            return {"input_ids": [1] * len(text.split())}

    data_iter = iter([{"text": "a b c"}, {"text": "d e f g h"}, {"text": "i j"}])
    out = data_mod.collect_samples_with_join(data_iter, FakeTok(), 2, 4)
    assert len(out) >= 1
    assert out[0].shape == (1, 4)


def test_stage_timer(tmp_path):
    t = StageTimer()
    with t.stage("a"):
        pass
    with t.stage("a"):
        pass
    assert "a" in t.times
    t.dump(tmp_path / "t.json")
    assert (tmp_path / "t.json").exists()


def test_squarehead_and_masked_sgd():
    s = jnp.ones((4, 4))
    t = jnp.ones((4, 4)) * 2
    loss = float(distill.squarehead_loss(s, t))
    assert abs(loss - 0.25) < 1e-6

    params = {"w": jnp.asarray([[1.0, 0.0], [2.0, 0.0]])}
    masks = distill.sparsity_masks(params)
    np.testing.assert_array_equal(np.asarray(masks["w"]), [[1, 0], [1, 0]])
    opt = distill.masked_sgd(0.1, masks)
    state = opt.init(params)
    grads = {"w": jnp.ones((2, 2))}
    updates, state = opt.update(grads, state, params)
    # masked entries receive zero update
    assert float(updates["w"][0, 1]) == 0.0
    assert float(updates["w"][0, 0]) != 0.0


def test_build_prompt():
    p = distill.build_prompt("Do X", "with Y")
    assert "Do X" in p and "with Y" in p
    p2 = distill.build_prompt("Do X")
    assert "Input" not in p2
