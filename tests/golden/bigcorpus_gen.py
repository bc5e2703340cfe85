"""Heaps-law corpus generator for large-scale benchmarks.

The 16 MB bench corpus (bench.make_corpus) uses a FIXED 100k-word
vocabulary, which under-represents how unique-word count grows with
corpus size in natural text (Heaps' law: V ~ k * N^beta).  For the
BASELINE config-2 benchmark (1 GB, vocab 32k) the word pool is sized
k * (bytes)^beta with k=6, beta=0.65 — ~1.5M distinct surface forms at
1 GB — so the deduplicated training working set scales realistically.

Fully vectorized: ~1 GB/min.  Deterministic per (size, seed).
"""

from __future__ import annotations

import os

import numpy as np


def heaps_vocab(n_bytes: int, k: float = 6.0, beta: float = 0.65) -> int:
    return max(1000, int(k * n_bytes ** beta))


def make_big_corpus(path: str, raw_mb: int, seed: int = 99,
                    max_word_len: int = 14) -> None:
    """Write a raw_mb MB zipf/Heaps corpus to path (skips if present)."""
    target = raw_mb * 10 ** 6
    if os.path.exists(path) and os.path.getsize(path) >= target * 0.98:
        return
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    rng = np.random.RandomState(seed)
    n_vocab = heaps_vocab(target)

    # ---- word pool: flat byte buffer + offsets (lognormal lengths, mean
    # ~5.5 letters; short words get low ranks so frequent words are
    # short, zipf-like)
    lens = np.rint(rng.lognormal(1.75, 0.40, n_vocab)).astype(np.int64)
    np.clip(lens, 2, max_word_len, out=lens)
    lens.sort()                     # rank 0 = shortest = most frequent
    pool_off = np.zeros(n_vocab + 1, np.int64)
    np.cumsum(lens, out=pool_off[1:])
    pool = rng.randint(97, 123, pool_off[-1]).astype(np.uint8)  # a-z

    # de-duplicate collisions cheaply: suffix a rank-unique letter pair on
    # words longer than 3 so the pool is (near-)collision free
    long_mask = lens >= 4
    li = np.nonzero(long_mask)[0]
    pool[pool_off[li + 1] - 2] = 97 + (li % 26).astype(np.uint8)
    pool[pool_off[li + 1] - 1] = 97 + ((li // 26) % 26).astype(np.uint8)

    probs = 1.0 / np.arange(1, n_vocab + 1) ** 1.0
    cdf = np.cumsum(probs / probs.sum())

    max_len = int(lens.max())
    gather_base = np.arange(max_len, dtype=np.int64)
    written = 0
    newline_every = 16              # words per line
    with open(path, "wb") as f:
        while written < target:
            n = 4_000_000           # words per block
            idx = np.searchsorted(cdf, rng.random_sample(n))
            np.clip(idx, 0, n_vocab - 1, out=idx)
            wl = lens[idx]
            out_off = np.zeros(n + 1, np.int64)
            np.cumsum(wl + 1, out=out_off[1:])   # +1 separator per word
            out = np.full(out_off[-1], 32, np.uint8)        # spaces
            out[out_off[1:][newline_every - 1::newline_every] - 1] = 10
            src = pool_off[idx][:, None] + gather_base[None, :]
            dst = out_off[:-1][:, None] + gather_base[None, :]
            mask = gather_base[None, :] < wl[:, None]
            out[dst[mask]] = pool[src[mask]]
            f.write(out.tobytes())
            written += len(out)
