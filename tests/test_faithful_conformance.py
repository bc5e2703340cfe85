"""Byte-exact conformance of the faithful CPU engine vs golden outputs of
the reference binary (UB-fixed; see docs/CONFORMANCE.md §4.1 and §6).

Mirrors the reference's own 8-test behavioral checklist
(test/bpe_test.cpp:330-339) where applicable, plus golden-file equality.
"""

import os

import numpy as np
import pytest

from golden.corpus_gen import GOLDEN_CONFIGS, corpus_text
from shredword_tpu.runtime.native import (FaithfulTrainer, NativeCorpus,
                                          NativeEncoder)

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")


def _golden_cases():
    for name, configs in GOLDEN_CONFIGS.items():
        for i, cfg in enumerate(configs):
            yield name, i, cfg


@pytest.fixture(scope="module")
def corpora(tmp_path_factory):
    out = {}
    d = tmp_path_factory.mktemp("confcorpus")
    for name in GOLDEN_CONFIGS:
        p = d / f"{name}.txt"
        p.write_text(corpus_text(name))
        out[name] = NativeCorpus.from_file(str(p), faithful_order=True)
    return out


@pytest.mark.parametrize("name,i,cfg", list(_golden_cases()),
                         ids=[f"{n}_{i}" for n, i, _ in _golden_cases()])
def test_merges_match_reference(corpora, tmp_path, name, i, cfg):
    tv, unk, cov, mf = cfg
    t = FaithfulTrainer(tv, unk, cov, mf)
    t.load(corpora[name])
    t.train()
    mine = t.merges()

    golden = np.fromfile(os.path.join(GOLDEN_DIR, f"{name}_{i}.merges"),
                         dtype=np.int32).reshape(-1, 3)
    assert len(mine) == len(golden), (
        f"merge count {len(mine)} != reference {len(golden)}")
    np.testing.assert_array_equal(mine, golden[:, :2])
    # new ids are dense from 256 (bpe.cpp:424)
    if len(golden):
        np.testing.assert_array_equal(golden[:, 2],
                                      np.arange(256, 256 + len(golden)))

    # where the reference survived its own save path, compare file bytes
    model_golden = os.path.join(GOLDEN_DIR, f"{name}_{i}.model")
    vocab_golden = os.path.join(GOLDEN_DIR, f"{name}_{i}.vocab")
    if os.path.exists(model_golden) or os.path.exists(vocab_golden):
        mp = str(tmp_path / "m.model")
        vp = str(tmp_path / "v.vocab")
        t.save(mp, vp)
        if os.path.exists(model_golden):
            assert open(mp, "rb").read() == open(model_golden, "rb").read()
        if os.path.exists(vocab_golden):
            assert open(vp, "rb").read() == open(vocab_golden, "rb").read()
    t.free()


def test_config_defaulting(corpora):
    # invalid coverage/min_freq fall back to 0.995/2000 (bpe.cpp:124-130;
    # reference test_config_defaults, bpe_test.cpp:79-94)
    t = FaithfulTrainer(400, -1, 0.0, 0)
    t.load(corpora["small"])
    n = t.train()
    # min_pair_freq defaulted to 2000 -> tiny corpus trains nothing
    assert n == 0
    t.free()


def test_incremental_training_equivalence(corpora):
    # train() in steps == train() in one go (checkpoint/resume hook;
    # reference bpe_merge_batch is incremental by construction)
    t1 = FaithfulTrainer(300, -1, 0.995, 2)
    t1.load(corpora["small"])
    t1.train()
    full = t1.merges()

    t2 = FaithfulTrainer(300, -1, 0.995, 2)
    t2.load(corpora["small"])
    while t2.train(max_merges=7) > 0:
        pass
    np.testing.assert_array_equal(full, t2.merges())
    t1.free()
    t2.free()


def test_final_corpus_state_consistency(corpora):
    # after training, re-encoding each original word with the merge table
    # must reproduce the trainer's final symbol stream exactly (links the
    # trainer and encoder contracts; no unk involved in this corpus config)
    t = FaithfulTrainer(300, -1, 1.5, 2)  # coverage>=1 -> default 0.995
    arrs = corpora["small"].arrays()
    t.load(corpora["small"])
    t.train()
    toks, wids = t.tokens()
    merges = t.merges()
    # words containing unk cannot round-trip through the byte encoder
    unk_words = set()
    for tok, w in zip(toks, wids):
        if tok == -1:
            unk_words.add(int(w))
    enc = NativeEncoder(merges)
    for wi in range(arrs.n_words):
        if wi in unk_words:
            continue
        word = arrs.word(wi)
        ids = enc.encode_words(np.frombuffer(word, dtype=np.uint8),
                               np.array([0, len(word)], dtype=np.int64))
        trained = toks[wids == wi]
        np.testing.assert_array_equal(ids, trained,
                                      err_msg=f"word {wi} {word!r}")
    t.free()
    enc.free()


def test_error_handling():
    with pytest.raises(IOError):
        NativeCorpus.from_file("/nonexistent/path/corpus.txt")
