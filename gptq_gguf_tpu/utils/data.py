"""Calibration / evaluation data loading.

Mirrors the reference's data_utils semantics exactly
(quant/gptq/src/data_utils.py == evopress/src == eval/src, SURVEY.md #6) —
these details determine reproducibility of published PPL numbers:

* wikitext2 train: random windows over the concatenated corpus (:50-53);
  test: contiguous blocks (:55-60);
* C4: pinned revision + join-collection with double newlines (:92-123);
* fineweb_edu: token-budgeted with split-long-sequences (:65-89);
* file path: pre-tokenized torch/np token tensors (:134-136).

Sequences are returned as a list of (1, S) numpy int arrays. A ``synthetic``
dataset generates a deterministic Zipf-ish stream for offline testing.
"""

from __future__ import annotations

import os
import random
from typing import Iterable, List, Optional

import numpy as np


def _tokenize(tokenizer, text: str) -> np.ndarray:
    ids = tokenizer(text, add_special_tokens=False)["input_ids"]
    return np.asarray(ids, dtype=np.int64)[None, :]


def collect_samples_with_join(
    data_iter: Iterable, tokenizer, num_samples: int, sequence_length: int, text_key: str = "text"
) -> List[np.ndarray]:
    """Join-and-trim collection (reference data_utils.py:14-36; it biases
    toward shorter sequences, kept for parity with C4 loading)."""
    data: List[np.ndarray] = []
    sep = _tokenize(tokenizer, "\n\n")
    current = np.zeros((1, 0), dtype=np.int64)
    for sample in data_iter:
        tok = _tokenize(tokenizer, sample[text_key])
        current = np.concatenate([current, tok], axis=1)
        if current.shape[1] >= sequence_length:
            data.append(current[:, :sequence_length])
            current = np.zeros((1, 0), dtype=np.int64)
        else:
            current = np.concatenate([current, sep], axis=1)
        if len(data) >= num_samples:
            break
    return data


def get_wikitext2(num_samples: int, sequence_length: int, tokenizer, train: bool = True):
    """(reference data_utils.py:40-61)"""
    from datasets import load_dataset

    split = "train" if train else "test"
    dataset = load_dataset("wikitext", "wikitext-2-raw-v1", split=split)
    tokens = _tokenize(tokenizer, "\n\n".join(dataset["text"]))
    data = []
    if train:
        for _ in range(num_samples):
            i = random.randint(0, tokens.shape[1] - sequence_length - 1)
            data.append(tokens[:, i : i + sequence_length])
    else:
        for i in range(tokens.shape[1] // sequence_length):
            data.append(tokens[:, i * sequence_length : (i + 1) * sequence_length])
    return data


def get_c4(num_samples: int, sequence_length: int, tokenizer, train: bool = True):
    """(reference data_utils.py:92-123; pinned revision)"""
    from datasets import load_dataset

    if train:
        dataset = load_dataset(
            "allenai/c4",
            "default",
            data_files={"train": "en/c4-train.00000-of-01024.json.gz"},
            split="train",
            revision="607bd4c8450a42878aa9ddc051a65a055450ef87",
        )
        return collect_samples_with_join(iter(dataset), tokenizer, num_samples, sequence_length)
    dataset = load_dataset(
        "allenai/c4",
        "default",
        data_files={"validation": "en/c4-validation.00000-of-00008.json.gz"},
        split="validation[:1100]",
        revision="607bd4c8450a42878aa9ddc051a65a055450ef87",
    )
    tokens = _tokenize(tokenizer, "\n\n".join(dataset["text"]))
    return [
        tokens[:, i * sequence_length : (i + 1) * sequence_length]
        for i in range(tokens.shape[1] // sequence_length)
    ]


def get_fineweb_edu(num_tokens: int, sequence_length: int, tokenizer,
                    train: bool = True, seed: int = 0):
    """Token-budgeted with split-long-sequences (reference data_utils.py:65-89)."""
    from datasets import load_dataset

    dataset = load_dataset("HuggingFaceFW/fineweb-edu", "sample-10BT", split="train")
    half = dataset.num_rows // 2
    dataset = dataset.select(range(half)) if train else dataset.select(range(half, dataset.num_rows))
    dataset = dataset.shuffle(seed=seed)
    data = []
    remaining = num_tokens
    it = iter(dataset)
    while remaining > 0:
        sample = next(it)
        tok = _tokenize(tokenizer, sample["text"])
        tok = tok[:, : min(tok.shape[1], remaining)]
        while tok.shape[1] > sequence_length:
            data.append(tok[:, :sequence_length])
            tok = tok[:, sequence_length:]
            remaining -= sequence_length
        data.append(tok)
        remaining -= tok.shape[1]
    return data


def get_synthetic(num_tokens: int, sequence_length: int, vocab_size: int = 32000, seed: int = 0):
    """Deterministic offline pseudo-corpus (markov chain over a Zipf vocab) —
    a framework addition for air-gapped testing; not in the reference."""
    rng = np.random.default_rng(seed)
    n_seq = max(1, num_tokens // sequence_length)
    probs = 1.0 / np.arange(1, vocab_size + 1) ** 1.1
    probs /= probs.sum()
    data = []
    for _ in range(n_seq):
        base = rng.choice(vocab_size, size=sequence_length, p=probs)
        # short-range repetition structure so models have something to learn
        rep = rng.random(sequence_length) < 0.3
        base[1:][rep[1:]] = base[:-1][rep[1:]]
        data.append(base[None, :].astype(np.int64))
    return data


def load_token_file(path: str, num_tokens: int, sequence_length: int):
    """Pre-tokenized file: torch .pt/.pth list-of-tensors or numpy .npy/.npz
    (reference data_utils.py:134-136)."""
    if path.endswith((".npy", ".npz")):
        arr = np.load(path)
        if isinstance(arr, np.lib.npyio.NpzFile):
            arr = arr[list(arr.keys())[0]]
        data = [arr[i][None, :] for i in range(arr.shape[0])]
    else:
        import torch

        obj = torch.load(path, map_location="cpu", weights_only=True)
        data = [np.asarray(t) for t in obj]
        data = [t if t.ndim == 2 else t[None, :] for t in data]
    data = data[: num_tokens // sequence_length]
    return [t[:, :sequence_length] for t in data]


def get_data(
    name_or_path: str,
    num_tokens: int,
    sequence_length: int,
    tokenizer=None,
    train: bool = True,
    vocab_size: int = 32000,
    seed: int = 0,
) -> List[np.ndarray]:
    """Dispatcher (reference data_utils.py:126-146 + synthetic). ``seed``
    drives the calibration sampling (reference quant.py --seed)."""
    random.seed(seed)
    if os.path.isfile(name_or_path):
        return load_token_file(name_or_path, num_tokens, sequence_length)
    if name_or_path == "wikitext2":
        return get_wikitext2(num_tokens // sequence_length, sequence_length, tokenizer, train)
    if name_or_path == "c4":
        return get_c4(num_tokens // sequence_length, sequence_length, tokenizer, train)
    if name_or_path == "fineweb_edu":
        return get_fineweb_edu(num_tokens, sequence_length, tokenizer, train,
                               seed=seed)
    if name_or_path.startswith("synthetic"):
        return get_synthetic(num_tokens, sequence_length, vocab_size,
                             seed=seed if train else seed + 1)
    raise ValueError(f"Unknown dataset: {name_or_path}")
