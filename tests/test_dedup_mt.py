"""The two-way threaded whitespace chunk+dedup scanner (r05,
csrc/dedup.cpp) must be BIT-IDENTICAL to the sequential semantics:
global first-occurrence unique numbering, with half-B-only uniques
appended in B order.  Exercises inputs straddling the 1 MiB threading
threshold against a transparent Python reference."""

import numpy as np
import pytest

from shredword_tpu.runtime import native


def _ref(data: np.ndarray):
    ws = np.isin(data, [32, 9, 13, 10])
    cuts = (np.nonzero(ws[1:] != ws[:-1])[0] + 1) if len(data) else \
        np.zeros(0, np.int64)
    bounds = np.concatenate([[0], cuts, [len(data)]]) if len(data) else \
        np.zeros(1, np.int64)
    seen = {}
    inv, off, lens = [], [], []
    for i in range(len(bounds) - 1):
        c = data[bounds[i]:bounds[i + 1]].tobytes()
        if c not in seen:
            seen[c] = len(seen)
            off.append(int(bounds[i]))
            lens.append(len(c))
        inv.append(seen[c])
    return (np.asarray(inv, np.int32), np.asarray(off, np.int64),
            np.asarray(lens, np.int32))


@pytest.mark.parametrize("n_bytes", [1 << 19, (1 << 20) + 12345,
                                     (1 << 21) + 7])
def test_ws_chunk_dedup_matches_reference(n_bytes):
    rng = np.random.default_rng(n_bytes)
    # zipf-ish words so both halves share most uniques (exercises the
    # A-table probe remap) plus some half-B-only words (the append arm)
    words = ["".join(chr(97 + c) for c in rng.integers(0, 26, l))
             for l in rng.integers(1, 9, 500)]
    p = 1.0 / np.arange(1, 501)
    p /= p.sum()
    parts = []
    total = 0
    while total < n_bytes:
        w = words[rng.choice(500, p=p)]
        parts.append(w)
        total += len(w) + 1
    text = " ".join(parts) + " zqzqunique" + str(n_bytes)
    data = np.frombuffer(text.encode(), np.uint8)

    inv, off, lens = native.ws_chunk_dedup(data)
    rinv, roff, rlens = _ref(data)
    np.testing.assert_array_equal(inv, rinv)
    np.testing.assert_array_equal(off, roff)
    np.testing.assert_array_equal(lens, rlens)
