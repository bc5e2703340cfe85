"""Differential tests: hist engine (2D layout + Pallas kernel, run in
interpret mode on CPU) vs the flat-stream engine (bpe_ops) — the merge
sequences must be bit-identical (both implement greedy lex-tie-break
BPE with exact counts)."""

import jax.numpy as jnp
import numpy as np
import pytest

from shredword_tpu.ops import bpe_hist, bpe_ops


def _flat_train(tokens, word_id, wcount, target, unk, minf):
    cap = max(1024, 1 << int(np.ceil(np.log2(max(len(tokens), 2)))))
    state = bpe_ops.make_state(tokens, word_id, wcount, cap)
    ts = bpe_ops.train_init(state, max(target, 1))
    ts = bpe_ops.train_loop(ts, jnp.int32(unk), jnp.int32(minf),
                            target_merges=target, max_steps=target + 4)
    n = int(ts.n_merges)
    length = int(ts.corpus.length)
    return (np.asarray(ts.merges)[:n], np.asarray(ts.merge_freqs)[:n],
            np.asarray(ts.corpus.tokens)[:length],
            np.asarray(ts.corpus.word_id)[:length])


def _rand_corpus(seed, n_words=300, alpha=6, max_len=12):
    rng = np.random.RandomState(seed)
    lens = rng.randint(1, max_len + 1, n_words)
    word_id = np.repeat(np.arange(n_words, dtype=np.int32), lens)
    tokens = rng.randint(97, 97 + alpha, len(word_id)).astype(np.int32)
    wcount = rng.randint(1, 60, n_words).astype(np.int32)[word_id]
    return tokens, word_id, wcount


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_hist_engine_matches_flat(seed):
    tokens, word_id, wcount = _rand_corpus(seed)
    target, unk, minf = 40, -1, 2
    out = bpe_hist.hist_train(
        tokens, word_id, wcount[np.searchsorted(
            word_id, np.arange(word_id[-1] + 1))],
        target_merges=target, unk_id=unk, min_pair_freq=minf,
        interpret=True)
    assert out is not None
    merges_h, freqs_h, ftok_h, fwid_h = out
    merges_f, freqs_f, ftok_f, fwid_f = _flat_train(
        tokens, word_id, wcount, target, unk, minf)
    np.testing.assert_array_equal(merges_h, merges_f)
    np.testing.assert_array_equal(freqs_h, freqs_f)
    np.testing.assert_array_equal(ftok_h, ftok_f)
    np.testing.assert_array_equal(fwid_h, fwid_f)


def test_hist_engine_overlap_runs():
    # 'aaaa'-style runs exercise the greedy overlap rule + deltas
    words = [b"aaaa", b"aaa", b"aa", b"baab", b"aabb"]
    counts = [7, 5, 3, 2, 9]
    tokens = np.concatenate(
        [np.frombuffer(w, np.uint8).astype(np.int32) for w in words])
    word_id = np.repeat(np.arange(len(words), dtype=np.int32),
                        [len(w) for w in words])
    wc_word = np.asarray(counts, np.int32)
    wcount = wc_word[word_id]
    out = bpe_hist.hist_train(tokens, word_id, wc_word, target_merges=10,
                              unk_id=-1, min_pair_freq=2, interpret=True)
    merges_h, freqs_h, ftok_h, fwid_h = out
    merges_f, freqs_f, ftok_f, fwid_f = _flat_train(
        tokens, word_id, wcount, 10, -1, 2)
    np.testing.assert_array_equal(merges_h, merges_f)
    np.testing.assert_array_equal(freqs_h, freqs_f)
    np.testing.assert_array_equal(ftok_h, ftok_f)


@pytest.mark.parametrize("seed", [0, 5])
def test_sparse_kernel_matches_dense(seed):
    """The chunk-skipping manual-DMA kernel must produce the dense
    pipeline's exact merge sequence."""
    tokens, word_id, wcount = _rand_corpus(seed, n_words=250)
    wc_word = wcount[np.searchsorted(word_id, np.arange(word_id[-1] + 1))]
    dense = bpe_hist.hist_train(tokens, word_id, wc_word,
                                target_merges=30, interpret=True,
                                sparse=False)
    sparse = bpe_hist.hist_train(tokens, word_id, wc_word,
                                 target_merges=30, interpret=True,
                                 sparse=True)
    np.testing.assert_array_equal(dense[0], sparse[0])
    np.testing.assert_array_equal(dense[1], sparse[1])
    np.testing.assert_array_equal(dense[2], sparse[2])


def test_hist_engine_with_unk():
    tokens, word_id, wcount = _rand_corpus(7, n_words=120, alpha=5)
    # map one symbol to unk
    unk = 99
    wc_word = wcount[np.searchsorted(word_id, np.arange(word_id[-1] + 1))]
    out = bpe_hist.hist_train(tokens, word_id, wc_word, target_merges=20,
                              unk_id=unk, min_pair_freq=2, interpret=True)
    merges_h, freqs_h, _, _ = out
    merges_f, freqs_f, _, _ = _flat_train(
        tokens, word_id, wcount, 20, unk, 2)
    np.testing.assert_array_equal(merges_h, merges_f)
    np.testing.assert_array_equal(freqs_h, freqs_f)
    assert not ((merges_h == unk).any())


def test_layout_fallback_for_long_words():
    tokens = np.arange(100, dtype=np.int32) % 26 + 97
    word_id = np.zeros(100, np.int32)  # one 100-byte word
    out = bpe_hist.hist_train(tokens, word_id, np.ones(1, np.int32),
                              target_merges=4, max_word_len=64,
                              interpret=True)
    assert out is None


# ---------------------------------------------------------------------
# fused whole-training kernel (hist + corpus resident in VMEM)
# ---------------------------------------------------------------------

def _wc_word(word_id, wcount):
    return wcount[np.searchsorted(word_id, np.arange(word_id[-1] + 1))]


def test_fused_matches_while_loop_engine():
    """The fused kernel (one pallas_call for the whole merge loop) must
    produce bit-identical merges/freqs/final corpus to the while_loop
    engine it replaces."""
    tokens, word_id, wcount = _rand_corpus(7, n_words=600, alpha=8)
    wcw = _wc_word(word_id, wcount)
    out_f = bpe_hist.hist_train(tokens, word_id, wcw, target_merges=40,
                                unk_id=-1, min_pair_freq=2, interpret=True)
    saved = bpe_hist.FUSED_VMEM_BUDGET
    bpe_hist.FUSED_VMEM_BUDGET = 0       # force the while_loop fallback
    try:
        out_w = bpe_hist.hist_train(tokens, word_id, wcw, target_merges=40,
                                    unk_id=-1, min_pair_freq=2,
                                    interpret=True, _cache={})
    finally:
        bpe_hist.FUSED_VMEM_BUDGET = saved
    for a, b in zip(out_f, out_w):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_fused_chunked_driving_matches_single_call():
    """steps_per_call smaller than the target must not change results
    (resume via n_done/init_done scalars) nor overshoot the target."""
    tokens, word_id, wcount = _rand_corpus(8, n_words=600, alpha=8)
    wcw = _wc_word(word_id, wcount)
    one = bpe_hist.hist_train(tokens, word_id, wcw, target_merges=40,
                              unk_id=-1, min_pair_freq=2, interpret=True)
    chunked = bpe_hist.hist_train(tokens, word_id, wcw, target_merges=40,
                                  unk_id=-1, min_pair_freq=2,
                                  interpret=True, max_steps_per_call=7,
                                  _cache={})
    assert len(chunked[0]) <= 40
    for a, b in zip(one, chunked):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_fused_big_variant_matches_small(monkeypatch):
    """The HBM-streamed table variant (v > VMEM budget) must produce the
    VMEM-resident kernel's exact merges/freqs/final corpus.  Forced by
    making the small variant's footprint estimate overflow."""
    tokens, word_id, wcount = _rand_corpus(11, n_words=600, alpha=8)
    wcw = _wc_word(word_id, wcount)
    small = bpe_hist.hist_train(tokens, word_id, wcw, target_merges=40,
                                unk_id=-1, min_pair_freq=2,
                                interpret=True, _cache={})
    monkeypatch.setattr(bpe_hist, "_fused_vmem_bytes",
                        lambda *a, **k: 1 << 60)
    big = bpe_hist.hist_train(tokens, word_id, wcw, target_merges=40,
                              unk_id=-1, min_pair_freq=2,
                              interpret=True, _cache={})
    for a, b in zip(small, big):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_fused_big_variant_chunked_resume(monkeypatch):
    """Big variant driven in several calls (steps_per_call < target)
    must match its single-call result."""
    tokens, word_id, wcount = _rand_corpus(12, n_words=400, alpha=7)
    wcw = _wc_word(word_id, wcount)
    monkeypatch.setattr(bpe_hist, "_fused_vmem_bytes",
                        lambda *a, **k: 1 << 60)
    one = bpe_hist.hist_train(tokens, word_id, wcw, target_merges=30,
                              unk_id=-1, min_pair_freq=2,
                              interpret=True, _cache={})
    chunked = bpe_hist.hist_train(tokens, word_id, wcw, target_merges=30,
                                  unk_id=-1, min_pair_freq=2,
                                  interpret=True, max_steps_per_call=9,
                                  _cache={})
    for a, b in zip(one, chunked):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_fused_exhaustion_and_lazy_final():
    """min_pair_freq too high -> zero merges; lazy_final defers the
    corpus extraction behind a callable."""
    tokens, word_id, wcount = _rand_corpus(9)
    wcw = _wc_word(word_id, wcount)
    out = bpe_hist.hist_train(tokens, word_id, wcw, target_merges=40,
                              unk_id=-1, min_pair_freq=10**9,
                              interpret=True, _cache={})
    assert len(out[0]) == 0
    merges, freqs, final_fn = bpe_hist.hist_train(
        tokens, word_id, wcw, target_merges=10, unk_id=-1,
        min_pair_freq=2, interpret=True, lazy_final=True)
    eager = bpe_hist.hist_train(tokens, word_id, wcw, target_merges=10,
                                unk_id=-1, min_pair_freq=2, interpret=True)
    np.testing.assert_array_equal(merges, eager[0])
    ftok, fwid = final_fn()
    np.testing.assert_array_equal(ftok, eager[2])
    np.testing.assert_array_equal(fwid, eager[3])
