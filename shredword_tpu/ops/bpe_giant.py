"""Giant-vocab fused BPE training: vocab to 32768, corpus in HBM.

The fused engines in bpe_hist.py keep the [V, V] pair table (and for the
flagship variant the corpus) VMEM-resident, which caps them at v <= 4096
and ~12 MB of corpus.  This engine removes both caps while keeping the
one-dispatch-per-training-run structure (grid = merges, zero host
round-trips per merge):

  table    int32[V, V//128, 128] in HBM, updated IN PLACE.  The trailing
           [VH, 128] "matrix" layout maps id v <-> (v >> 7, v & 127), so a
           table ROW, the left/right delta vectors, and the row-max vector
           all share one indexing scheme — row updates are elementwise
           matrix ops with no transposes.
  pick     a VMEM-resident row-max matrix int32[VH, 128] maintained as an
           UPPER BOUND; the pick loop takes the apparent global max, DMAs
           that single row, and either confirms (true max == claimed) or
           refreshes the bound and repeats.  This is the TPU-native analog
           of the reference's lazy heap invalidation (bpe.cpp:406-415):
           decrements leave stale-high entries that are corrected only
           when they surface as the apparent maximum.  Tie-break: smallest
           row, then smallest column — the documented lex rule, identical
           to the flat/hist engines.
  updates  row b / row new as whole-row matrix RMWs; columns a/new as
           128-row x 128-lane strip RMWs gated on the delta vector's
           per-128-row sparsity; merged cell zeroed last, with row a's
           max refreshed exactly for free (reference accounting semantics
           of bpe_merge_batch, bpe.cpp:437-517 — see apply_hist_updates).
  corpus   int16[L, W] in HBM, words SORTED BY LENGTH into 512-wide lane
           chunks; chunks are skipped via an EXACT token-presence index
           int8[V, NC] (presence of a AND b is necessary for a match).
           Presence rows for a, b, new are re-written exactly each merge
           from per-chunk any()-reductions, so the index never decays.
           Flagged chunk ids are scanned from SMEM (the flag vector is
           DMA'd VMEM->SMEM once per merge); per-chunk loop bounds come
           from a prefetched per-chunk max-word-length array, which the
           length sort keeps small for most chunks.
  deltas   the slot-collapse extraction of bpe_hist._slot_delta_accum,
           scattered into the [VH, 128] delta matrices by exact one-hot
           MXU matmuls: weights split 15/16 bits so every f32 partial dot
           is exact (512 lanes x (2^15 - 1) < 2^24).

Initial ids are bytes (or unk < 256), so the initial pair table lives in
[0, 256)^2: the driver builds it with the small init_hist and embeds it
into the zeroed giant table on device — nothing quadratic in V is ever
uploaded through the host link.

Conformance: bit-identical merge sequences to bpe_ops.train_loop (lex
tie-break) — enforced by differential tests.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..utils.jaxcache import ensure_jax_cache
from .bpe_hist import PAD, _shift_down, _shift_down_k, _shift_up

ensure_jax_cache()

INT32_MAX = jnp.iinfo(jnp.int32).max
MXU_C = 512        # MXU-scatter lane width (fixed: 512 * (2^15 - 1) < 2^24
                   # keeps every f32 partial dot exact)
C = 1024           # default chunk DMA width (multiple of MXU_C).  Wider
                   # chunks mean fewer/bigger DMAs but coarser presence
                   # skipping; the exact MXU scatter always runs on
                   # 512-lane sub-slices.  Swept on a real v5e chip
                   # (ms/merge, 32k vocab): 16 MB corpus 512->0.42,
                   # 1024->0.36, 2048->0.58 (r3); 1 GB corpus r4 re-sweep
                   # 1024->7.5, 2048->6.1, 4096->18.9 — 2048 is the
                   # GB-scale optimum, auto-selected by giant_train
                   # above 1.5M unique words (merge sequences are
                   # width-independent: 17242 at every width).
                   # 1024 also avoids a Mosaic compile blow-up seen at
                   # 512 with NC=256 (~460 s).
                   # Tunable per corpus via giant_train(chunk_width=...).
SLAB = 128         # table rows per column-update strip (1 delta-matrix row)
MAX_V = 32768      # int16 corpus ids
MAX_NC = 16384     # flag-scan bound (W <= MAX_NC * C words)


# ---------------------------------------------------------------------
# host-side layout
# ---------------------------------------------------------------------

class GiantLayout(NamedTuple):
    tw: np.ndarray      # int16[L, W] tokens, words sorted by length
    wc: np.ndarray      # int32[1, W] word weights
    lens: np.ndarray    # int32[NC] max word length per chunk
    presT: np.ndarray   # int8[V, NC] exact token-in-chunk presence
    perm: np.ndarray    # int64[n_words] original word index per column
    n_words: int


def build_giant_layout(tokens: np.ndarray, word_id: np.ndarray,
                       wcount: np.ndarray, v: int,
                       max_word_len: int = 64,
                       cw: int = C) -> GiantLayout | None:
    """Length-sorted [L, W] layout + presence index; None if a word
    exceeds max_word_len (caller falls back to the flat engine).

    wcount is PER WORD (length = number of words).
    """
    if len(tokens) == 0:
        return None
    n_words = int(word_id[-1]) + 1
    lens = np.bincount(word_id, minlength=n_words)
    L = int(lens.max(initial=1))
    if L > max_word_len:
        return None
    L = max(16, 1 << int(np.ceil(np.log2(L))))
    if n_words > MAX_NC * cw:
        return None
    perm = np.argsort(lens, kind="stable")          # short words first
    NC = max(1, -(-n_words // cw))
    NC = -(-NC // 128) * 128                        # presT lane multiple
    W = NC * cw
    tw = np.full((L, W), PAD, np.int16)
    starts = np.zeros(n_words + 1, np.int64)
    np.cumsum(lens, out=starts[1:])
    # column of word perm[j] is j: scatter token positions via inv perm
    inv = np.empty(n_words, np.int64)
    inv[perm] = np.arange(n_words)
    pos = np.arange(len(tokens)) - starts[word_id]
    tw[pos, inv[word_id]] = tokens                  # initial ids < 256
    wc = np.zeros((1, W), np.int32)
    wc[0, inv] = wcount
    chunk_lens = np.zeros(NC, np.int32)
    sorted_lens = lens[perm]
    nfull = n_words // cw
    if nfull:
        chunk_lens[:nfull] = sorted_lens[:nfull * cw].reshape(nfull, cw).max(1)
    if n_words % cw:
        chunk_lens[nfull] = sorted_lens[nfull * cw:].max(initial=0)
    presT = np.zeros((v, NC), np.int8)
    chunk_of = (inv[word_id] // cw).astype(np.int64)
    key = np.unique(tokens.astype(np.int64) * NC + chunk_of)
    presT[(key // NC).astype(np.int64), key % NC] = 1
    return GiantLayout(tw, wc, chunk_lens, presT, perm, n_words)


# ---------------------------------------------------------------------
# kernel helpers
# ---------------------------------------------------------------------

def _extract_row(mat, r):
    """[1, cols] copy of sublane r of a [rows, cols] array (masked sum —
    dynamic sublane slicing is not relied on)."""
    ri = jax.lax.broadcasted_iota(jnp.int32, mat.shape, 0)
    return jnp.sum(jnp.where(ri == r, mat, 0), axis=0, keepdims=True)


def _transpose_row(row, ident):
    """Exact int32 [1, 128] -> [128, 1] via hi/lo split identity dots."""
    lo = (row & 0x7FFF).astype(jnp.float32)
    hi = (row >> 15).astype(jnp.float32)
    dims = (((1,), (1,)), ((), ()))
    lo_c = jax.lax.dot_general(ident, lo, dims,
                               precision=jax.lax.Precision.HIGHEST,
                               preferred_element_type=jnp.float32)
    hi_c = jax.lax.dot_general(ident, hi, dims,
                               precision=jax.lax.Precision.HIGHEST,
                               preferred_element_type=jnp.float32)
    return hi_c.astype(jnp.int32) * 32768 + lo_c.astype(jnp.int32)


def _mxu_scatter(vals, w, acc_ref, vh: int):
    """acc[0:vh, 128] += sum_lane w * onehot2d(vals): exact one-hot MXU
    scatter (weights split 15/16 bits; every f32 partial sum < 2^24 for
    C <= 512 lanes).  vals/w are [1, C] int32; invalid lanes must carry
    w == 0 (their value may be anything, including negatives).  `vh` is
    the LIVE row bound — every weighted value must be < vh * 128, so
    early dispatches pass a small bound and skip the dead top of the
    table (the dominant per-chunk cost scales with vh)."""
    c = vals.shape[1]
    hi = vals >> 7
    lo = vals & 127
    rows = jax.lax.broadcasted_iota(jnp.int32, (vh, c), 0)
    a_m = (rows == jnp.broadcast_to(hi, (vh, c))).astype(jnp.float32)
    cols = jax.lax.broadcasted_iota(jnp.int32, (c, 128), 1)
    onehot_lo = (cols == jnp.broadcast_to(lo.reshape(c, 1),
                                          (c, 128))).astype(jnp.float32)
    wlo = jnp.broadcast_to((w & 0x7FFF).astype(jnp.float32).reshape(c, 1),
                           (c, 128)) * onehot_lo
    whi = jnp.broadcast_to((w >> 15).astype(jnp.float32).reshape(c, 1),
                           (c, 128)) * onehot_lo
    dims = (((1,), (0,)), ((), ()))
    plo = jax.lax.dot_general(a_m, wlo, dims,
                              precision=jax.lax.Precision.HIGHEST,
                              preferred_element_type=jnp.float32)
    phi = jax.lax.dot_general(a_m, whi, dims,
                              precision=jax.lax.Precision.HIGHEST,
                              preferred_element_type=jnp.float32)
    acc_ref[0:vh, :] += (phi.astype(jnp.int32) * 32768
                         + plo.astype(jnp.int32))


def _select_apply_dyn(tt, a, b, new, l_c, L):
    """Greedy left-to-right selection + merge + compaction (identical
    semantics to the reference's non-advancing splice, bpe.cpp:480-482).

    Round-5 rewrite: the original here ran 2*l_c serial VPU passes
    (an l_c-step select recurrence + an (l_c-1)-step hole march); at GB
    scale those per-chunk passes were the measured ~3 us/flagged-chunk
    fixed cost that kept the engine ~10x off the stream roofline.  Now
    uses the same log-depth closed form as bpe_hist._select_and_apply
    (log2 L shift-max passes) and a first-hole compaction loop bounded
    by the actual max matches per word (usually 1) — ~6-10 passes
    instead of ~30 at L=16.  `l_c` only bounds nothing here anymore;
    kept in the signature for the callers' slot-loop bound."""
    del l_c
    cc = tt.shape[1]
    row = jax.lax.broadcasted_iota(jnp.int32, (L, cc), 0)
    nxt = _shift_up(tt, PAD)
    m = (tt == a) & (nxt == b)
    x = jnp.where(m, -1, row)             # last non-match row, cumulative
    s = 1
    while s < L:
        x = jnp.maximum(x, _shift_down_k(x, s, -1))
        s *= 2
    sel = (m & (((row - x) & 1) == 1)).astype(jnp.int32)
    t2 = tt + sel * (new - tt)
    hole = _shift_down(sel, 0)
    nhole = jnp.max(jnp.sum(sel, axis=0))

    def collapse_first_hole(_, carry):
        t2, hole = carry
        hc = hole
        s = 1
        while s < L:                      # cumulative OR, hole and below
            hc = hc | _shift_down_k(hc, s, 0)
            s *= 2
        on = hc != 0
        t2 = jnp.where(on, _shift_up(t2, PAD), t2)
        hole = jnp.where(on, _shift_up(hole, 0), hole)
        return t2, hole

    t2, _ = jax.lax.fori_loop(0, nhole, collapse_first_hole, (t2, hole))
    return t2, sel


def _slot_deltas_mxu(tt, sel, ww, new, unk, l_c, vh, dl_ref, dr_ref):
    """Slot-collapse neighbor extraction (bpe_merge_batch accounting,
    bpe.cpp:437-470 — see bpe_hist._slot_delta_accum) feeding the MXU
    scatter instead of an O(V x C) lane-reduce histogram."""
    L, cc = tt.shape
    sel2 = _shift_down(_shift_down(sel, 0), 0)
    t_up = _shift_down(tt, PAD)
    lval = t_up + sel2 * (new - t_up)
    rval = _shift_up(_shift_up(tt, PAD), PAD)
    wsel = sel * ww
    wl = jnp.where((lval >= 0) & (lval != unk), wsel, 0)
    wr = jnp.where((rval >= 0) & (rval != unk), wsel, 0)
    cs = sel
    sh = 1
    while sh < L:
        r = pltpu.roll(cs, shift=sh, axis=0)
        rowi = jax.lax.broadcasted_iota(jnp.int32, (L, cc), 0)
        cs = cs + jnp.where(rowi >= sh, r, 0)
        sh *= 2

    def slot_body(k, carry):
        slot = (sel != 0) & (cs == k + 1)

        @pl.when(jnp.any(slot))
        def _():
            lv = jnp.sum(jnp.where(slot, lval, 0), axis=0, keepdims=True)
            lw = jnp.sum(jnp.where(slot, wl, 0), axis=0, keepdims=True)
            rv = jnp.sum(jnp.where(slot, rval, 0), axis=0, keepdims=True)
            rw = jnp.sum(jnp.where(slot, wr, 0), axis=0, keepdims=True)
            _mxu_scatter(lv, lw, dl_ref, vh)
            _mxu_scatter(rv, rw, dr_ref, vh)
        return carry

    # bound by the ACTUAL max match ordinal in this block (usually 1),
    # not the worst case l_c/2 — each skipped iteration still costs an
    # any()-pass, which at GB scale is real per-chunk fixed cost
    nsl = jnp.minimum(jnp.max(cs * sel), (l_c + 1) // 2)
    jax.lax.fori_loop(0, nsl, slot_body, 0)


# ---------------------------------------------------------------------
# the fused giant kernel: grid = merges
# ---------------------------------------------------------------------

def _giant_kernel(v: int, L: int, NC: int, W: int, cw: int,
                  vh_eff: int, kb: int,
                  lens_ref, scal_ref,            # scalar prefetch (SMEM)
                  wc_hbm, tw_hbm, h_in, p_in, rmax_in,   # inputs
                  tw_out, h_io, p_io, rmax_ref, mrow_ref,  # outputs
                  done_s, dl_ref, dr_ref, rowbuf, slabbuf,
                  tbuf, wbuf, prgrp, stillA, stillB, hasN, flagsv,
                  flag_smem, list_smem, subt, subsel, subw,
                  sem_a, sem_b, sem_c, sem_t, sem_w):
    # h_in/p_in/tw_hbm are only accessed through their aliases (in-place).
    del h_in, p_in
    vh = v // 128
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        done_s[0] = scal_ref[3]
        # output VMEM blocks start uninitialized: seed the row-max matrix
        # from its input block once (it persists across grid steps)
        rmax_ref[:] = rmax_in[:]

    unk = scal_ref[0]
    min_freq = scal_ref[1]
    new = 256 + scal_ref[2] + i
    nc_used = scal_ref[5]

    li = (jax.lax.broadcasted_iota(jnp.int32, (vh, 128), 0) * 128
          + jax.lax.broadcasted_iota(jnp.int32, (vh, 128), 1))
    i128 = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)
    ident = (i128 == jax.lax.broadcasted_iota(
        jnp.int32, (128, 128), 1)).astype(jnp.float32)

    # ---- lazy pick: argmax over the upper-bound row-max matrix, verify
    # by reading the single claimed row, refresh + retry on staleness
    # (lazy heap invalidation, bpe.cpp:406-415, rebuilt TPU-style)
    def pick_cond(carry):
        return carry[0] == 0

    def pick_body(carry):
        _, _, _, n_ref = carry
        rmm = jnp.where(rmax_ref[:] >= min_freq, rmax_ref[:], 0)
        m = jnp.max(rmm)
        a = jnp.where(m > 0,
                      jnp.min(jnp.where(rmm == m, li, INT32_MAX)), 0)

        @pl.when(m > 0)
        def _():
            cp = pltpu.make_async_copy(h_io.at[a], rowbuf, sem_a)
            cp.start()
            cp.wait()

        true_max = jnp.max(rowbuf[:])
        stale = (m > 0) & (true_max != m)

        @pl.when(stale)
        def _():
            rmax_ref[:] = jnp.where(li == a, true_max, rmax_ref[:])

        return jnp.where(stale, 0, 1), a, m, n_ref + 1

    _, a, m, n_refresh = jax.lax.while_loop(
        pick_cond, pick_body,
        (jnp.int32(0), jnp.int32(0), jnp.int32(0), jnp.int32(0)))
    do = (m > 0) & (done_s[0] == 0) & (i < scal_ref[4])
    a = jnp.where(do, a, 0)
    b = jnp.where(do,
                  jnp.min(jnp.where(rowbuf[:] == m, li, INT32_MAX)), 0)

    lane = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
    mrow_ref[:] = (jnp.where(lane == 0, a, 0) + jnp.where(lane == 1, b, 0)
                   + jnp.where(lane == 2, m, 0)
                   + jnp.where(lane == 3, do.astype(jnp.int32), 0)
                   + jnp.where(lane == 4, n_refresh, 0))

    @pl.when(jnp.logical_not(do))
    def _():
        done_s[0] = 1          # sticky: merging never revives a pair

    @pl.when(do)
    def _():
        dl_ref[:] = jnp.zeros_like(dl_ref)
        dr_ref[:] = jnp.zeros_like(dr_ref)

        # ---- chunk flags from the exact presence index
        a32 = (a // 32) * 32
        b32 = (b // 32) * 32
        cp = pltpu.make_async_copy(p_io.at[pl.ds(a32, 32), :], prgrp, sem_b)
        cp.start()
        cp.wait()
        rowa = _extract_row(prgrp[:].astype(jnp.int32), a - a32)
        cp = pltpu.make_async_copy(p_io.at[pl.ds(b32, 32), :], prgrp, sem_b)
        cp.start()
        cp.wait()
        rowb = _extract_row(prgrp[:].astype(jnp.int32), b - b32)
        stillA[:] = rowa
        stillB[:] = rowb
        hasN[:] = jnp.zeros_like(hasN)
        flagsv[:] = rowa * rowb
        cp = pltpu.make_async_copy(flagsv, flag_smem, sem_b)
        cp.start()
        cp.wait()

        lane_nc = jax.lax.broadcasted_iota(jnp.int32, (1, NC), 1)

        # ---- compact the flagged chunk ids into an SMEM list (scalar
        # sweep), then iterate DENSELY over flagged chunks, KB chunks
        # per step, with double-buffered input DMA: batch k+1's
        # tokens+weights stream in while batch k is processed.  Wide
        # batches amortize the per-VPU-pass issue latency of the
        # select/compact over KB chunks (words are COLUMNS, so
        # horizontal batching preserves per-word semantics exactly) —
        # the r05 profile's residual per-chunk fixed cost after the
        # log-depth select.
        def scanf(c, cnt):
            @pl.when(flag_smem[0, c] != 0)
            def _():
                list_smem[0, cnt] = c
            return cnt + jnp.where(flag_smem[0, c] != 0, 1, 0)

        nf = jax.lax.fori_loop(0, nc_used, scanf, jnp.int32(0))

        bw = kb * cw
        lane_bw = jax.lax.broadcasted_iota(jnp.int32, (1, bw), 1)

        def start_in(batch, slot):
            base = batch * kb
            for j in range(kb):
                @pl.when(base + j < nf)   # never read stale list slots
                def _(j=j):
                    c = list_smem[0, base + j]
                    pltpu.make_async_copy(
                        tw_out.at[:, pl.ds(c * cw, cw)],
                        tbuf.at[slot, slice(None), pl.ds(j * cw, cw)],
                        sem_t.at[slot, j]).start()
                    pltpu.make_async_copy(
                        wc_hbm.at[:, pl.ds(c * cw, cw)],
                        wbuf.at[slot, slice(None), pl.ds(j * cw, cw)],
                        sem_w.at[slot, j]).start()

        nbat = (nf + kb - 1) // kb

        @pl.when(nf > 0)
        def _():
            start_in(0, 0)

        def chunk_body(kbi, carry):
            slot = jax.lax.rem(kbi, 2)
            base = kbi * kb
            for j in range(kb):
                @pl.when(base + j < nf)
                def _(j=j):
                    c = list_smem[0, base + j]
                    pltpu.make_async_copy(
                        tw_out.at[:, pl.ds(c * cw, cw)],
                        tbuf.at[slot, slice(None), pl.ds(j * cw, cw)],
                        sem_t.at[slot, j]).wait()
                    pltpu.make_async_copy(
                        wc_hbm.at[:, pl.ds(c * cw, cw)],
                        wbuf.at[slot, slice(None), pl.ds(j * cw, cw)],
                        sem_w.at[slot, j]).wait()

            @pl.when(kbi + 1 < nbat)
            def _():
                start_in(kbi + 1, 1 - slot)

            # batch-max word length bounds the MXU slot loop; guarded
            # index (min with nf-1) so no stale slot is ever read
            l_c = jnp.int32(0)
            for j in range(kb):
                idx = base + j
                cj = list_smem[0, jnp.minimum(idx,
                                              jnp.maximum(nf - 1, 0))]
                l_c = jnp.maximum(
                    l_c, jnp.where(idx < nf, lens_ref[cj], 0))

            # columns beyond the last valid chunk neutralize to
            # PAD/weight-0: no matches, no deltas, never written back
            valid_col = (lane_bw // cw) < (nf - base)
            tt = jnp.where(valid_col, tbuf[slot].astype(jnp.int32), PAD)
            ww = jnp.where(valid_col, wbuf[slot], 0)
            nxt0 = _shift_up(tt, PAD)
            mm = (tt == a) & (nxt0 == b)

            @pl.when(jnp.any(mm))
            def _():
                t2, sel = _select_apply_dyn(tt, a, b, new, l_c, L)
                # exact MXU scatter is capped at 512 lanes; run it on
                # sub-slices of the batch, staged through scratch so
                # each slice gets a zero-offset layout
                for j in range(bw // MXU_C):
                    sl = slice(j * MXU_C, (j + 1) * MXU_C)
                    @pl.when(jnp.any(mm[:, sl]))
                    def _(sl=sl):
                        subt[:] = tt[:, sl]
                        subsel[:] = sel[:, sl]
                        subw[:] = ww[:, sl]
                        _slot_deltas_mxu(subt[:], subsel[:],
                                         subw[:], new, unk, l_c,
                                         vh_eff, dl_ref, dr_ref)
                # per-chunk presence updates + write-back (only chunks
                # that actually matched)
                for j in range(kb):
                    jsl = slice(j * cw, (j + 1) * cw)
                    @pl.when((base + j < nf) & jnp.any(mm[:, jsl]))
                    def _(j=j, jsl=jsl):
                        c = list_smem[0, base + j]
                        here = (lane_nc == c)
                        t2j = t2[:, jsl]
                        tbuf[slot, slice(None), pl.ds(j * cw, cw)] =                             t2j.astype(jnp.int16)
                        stillA[:] = jnp.where(
                            here,
                            jnp.any(t2j == a).astype(jnp.int32),
                            stillA[:])
                        stillB[:] = jnp.where(
                            here,
                            jnp.any(t2j == b).astype(jnp.int32),
                            stillB[:])
                        hasN[:] = jnp.where(here, 1, hasN[:])
                        cp_o = pltpu.make_async_copy(
                            tbuf.at[slot, slice(None),
                                    pl.ds(j * cw, cw)],
                            tw_out.at[:, pl.ds(c * cw, cw)], sem_c)
                        cp_o.start()
                        cp_o.wait()
            return carry

        jax.lax.fori_loop(0, nbat, chunk_body, 0)

        # ---- exact presence row rewrites (a, then b, then new; groups
        # are re-read so overlapping 32-row groups stay consistent)
        gi = jax.lax.broadcasted_iota(jnp.int32, (32, NC), 0)

        def rmw_presence(tok, bits):
            t32 = (tok // 32) * 32
            cp_i = pltpu.make_async_copy(
                p_io.at[pl.ds(t32, 32), :], prgrp, sem_b)
            cp_i.start()
            cp_i.wait()
            prgrp[:] = jnp.where(gi == tok - t32,
                                 jnp.broadcast_to(bits, (32, NC)),
                                 prgrp[:].astype(jnp.int32)).astype(jnp.int8)
            cp_o = pltpu.make_async_copy(
                prgrp, p_io.at[pl.ds(t32, 32), :], sem_b)
            cp_o.start()
            cp_o.wait()

        rmw_presence(a, stillA[:])
        rmw_presence(b, stillB[:])
        rmw_presence(new, hasN[:])

        # ---- table updates (apply_hist_updates semantics; all additive
        # terms commute, merged cell zeroed last):
        # 1. row b -= dr  (whole-row matrix RMW; exact max at this point
        #    feeds the bound — later additive increases are covered by
        #    the max-with-dl below)
        cp_i = pltpu.make_async_copy(h_io.at[b], rowbuf, sem_a)
        cp_i.start()
        cp_i.wait()
        newrow_b = rowbuf[:] - dr_ref[:]
        rowbuf[:] = newrow_b
        rmax_ref[:] = jnp.where(li == b, jnp.max(newrow_b), rmax_ref[:])
        cp_o = pltpu.make_async_copy(rowbuf, h_io.at[b], sem_a)
        cp_o.start()
        cp_o.wait()

        # 2. row new = dr (fresh row; its (new, a)/(new, new) corrections
        #    arrive via the column strips below)
        rowbuf[:] = dr_ref[:]
        cp_o = pltpu.make_async_copy(rowbuf, h_io.at[new], sem_a)
        cp_o.start()
        cp_o.wait()

        # 3. columns a/new +-= dl as gated 128-row strips
        a_hi, a_lo = a // 128, a % 128
        n_hi, n_lo = new // 128, new % 128
        lane128 = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)

        def slab_body(s, carry):
            dlrow = _extract_row(dl_ref[:], s)

            @pl.when(jnp.any(dlrow != 0))
            def _():
                col_dl = _transpose_row(dlrow, ident)      # [128, 1]

                def strip(cq, cl, sign):
                    cp_i = pltpu.make_async_copy(
                        h_io.at[pl.ds(s * 128, 128), cq], slabbuf, sem_a)
                    cp_i.start()
                    cp_i.wait()
                    slabbuf[:] = slabbuf[:] + sign * col_dl * (
                        lane128 == cl)
                    cp_o = pltpu.make_async_copy(
                        slabbuf, h_io.at[pl.ds(s * 128, 128), cq], sem_a)
                    cp_o.start()
                    cp_o.wait()

                strip(a_hi, a_lo, -1)
                strip(n_hi, n_lo, 1)
            return carry

        jax.lax.fori_loop(0, vh, slab_body, 0)

        # 4. merged cell -> 0; row a is final now, refresh its max exactly
        cp_i = pltpu.make_async_copy(h_io.at[a], rowbuf, sem_a)
        cp_i.start()
        cp_i.wait()
        rowa_f = jnp.where(li == b, 0, rowbuf[:])
        rowbuf[:] = rowa_f
        cp_o = pltpu.make_async_copy(rowbuf, h_io.at[a], sem_a)
        cp_o.start()
        cp_o.wait()

        # 5. row-max bound maintenance: col-new increases are bounded by
        #    dl; row new's max is computed exactly from dl/dr
        dlnew = jnp.sum(jnp.where(li == new, dl_ref[:], 0))
        rn = (dr_ref[:] + jnp.where(li == new, dlnew, 0)
              - jnp.where(li == a, dlnew, 0))
        rmax = jnp.maximum(rmax_ref[:], dl_ref[:])
        rmax = jnp.where(li == new, jnp.max(rn), rmax)
        rmax = jnp.where(li == a, jnp.max(rowa_f), rmax)
        rmax_ref[:] = rmax


def make_giant_train(v: int, L: int, NC: int, steps: int,
                     interpret: bool = False, cw: int = C,
                     vh_eff: int | None = None, kb: int = 1):
    """One pallas_call = `steps` greedy merges at giant scale.

    giant(lens, scal, wc, tw, hist4, presT, rowmax) ->
        (tw', hist4', presT', rowmax', mrows)

    tw int16[L, W]; hist4 int32[v, v//128, 128]; presT int8[v, NC];
    rowmax int32[v//128, 128]; scal int32[6] = (unk_id, min_pair_freq,
    n_done, init_done, steps_allowed, nc_used).  mrows as in
    make_fused_train: step k's record at row 8k, lanes (a, b, freq, did).
    tw/hist4/presT/rowmax are donated and updated in place.
    """
    W = NC * cw
    vh = v // 128
    vh_eff = vh if vh_eff is None else min(vh_eff, vh)
    kernel = partial(_giant_kernel, v, L, NC, W, cw, vh_eff, kb)

    @partial(jax.jit, donate_argnums=(3, 4, 5, 6))
    def giant(lens, scal, wc, tw, hist4, presT, rowmax):
        return pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=2,              # lens, scal
                grid=(steps,),
                in_specs=[
                    pl.BlockSpec(memory_space=pl.ANY),   # wc
                    pl.BlockSpec(memory_space=pl.ANY),   # tw
                    pl.BlockSpec(memory_space=pl.ANY),   # hist4
                    pl.BlockSpec(memory_space=pl.ANY),   # presT
                    pl.BlockSpec((vh, 128), lambda i, *s: (0, 0),
                                 memory_space=pltpu.VMEM),   # rowmax
                ],
                out_specs=[
                    pl.BlockSpec(memory_space=pl.ANY),   # tw out
                    pl.BlockSpec(memory_space=pl.ANY),   # hist4 out
                    pl.BlockSpec(memory_space=pl.ANY),   # presT out
                    pl.BlockSpec((vh, 128), lambda i, *s: (0, 0),
                                 memory_space=pltpu.VMEM),   # rowmax out
                    pl.BlockSpec((8, 128), lambda i, *s: (i, 0),
                                 memory_space=pltpu.VMEM),   # mrows
                ],
                scratch_shapes=[
                    pltpu.SMEM((1,), jnp.int32),             # done
                    pltpu.VMEM((vh, 128), jnp.int32),        # dl
                    pltpu.VMEM((vh, 128), jnp.int32),        # dr
                    pltpu.VMEM((vh, 128), jnp.int32),        # rowbuf
                    pltpu.VMEM((SLAB, 128), jnp.int32),      # slabbuf
                    pltpu.VMEM((2, L, kb * cw), jnp.int16),  # tbuf x2
                    pltpu.VMEM((2, 1, kb * cw), jnp.int32),  # wbuf x2
                    pltpu.VMEM((32, NC), jnp.int8),          # presence grp
                    pltpu.VMEM((1, NC), jnp.int32),          # stillA
                    pltpu.VMEM((1, NC), jnp.int32),          # stillB
                    pltpu.VMEM((1, NC), jnp.int32),          # hasN
                    pltpu.VMEM((1, NC), jnp.int32),          # flags
                    pltpu.SMEM((1, NC), jnp.int32),          # flags scan
                    pltpu.SMEM((1, NC), jnp.int32),          # flagged list
                    pltpu.VMEM((L, MXU_C), jnp.int32),       # subt
                    pltpu.VMEM((L, MXU_C), jnp.int32),       # subsel
                    pltpu.VMEM((1, MXU_C), jnp.int32),       # subw
                    pltpu.SemaphoreType.DMA(()),             # sem_a
                    pltpu.SemaphoreType.DMA(()),             # sem_b
                    pltpu.SemaphoreType.DMA(()),             # sem_c
                    pltpu.SemaphoreType.DMA((2, kb)),        # sem_t
                    pltpu.SemaphoreType.DMA((2, kb)),        # sem_w
                ],
            ),
            out_shape=[
                jax.ShapeDtypeStruct((L, W), jnp.int16),
                jax.ShapeDtypeStruct((v, vh, 128), jnp.int32),
                jax.ShapeDtypeStruct((v, NC), jnp.int8),
                jax.ShapeDtypeStruct((vh, 128), jnp.int32),
                jax.ShapeDtypeStruct((steps * 8, 128), jnp.int32),
            ],
            # args order: lens, scal, wc, tw, hist4, presT, rowmax
            input_output_aliases={3: 0, 4: 1, 5: 2, 6: 3},
            interpret=interpret,
            compiler_params=None if interpret else pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
                has_side_effects=True),
        )(lens, scal, wc, tw, hist4, presT, rowmax)

    return giant


# ---------------------------------------------------------------------
# driver
# ---------------------------------------------------------------------

@partial(jax.jit, static_argnames=("v", "id_bound"))
def _giant_init_tables(tw, wc, unk_id, *, v: int, id_bound: int = 256):
    """Initial [v, vh, 128] pair table + row-max matrix on device.

    Fresh runs: ids are bytes (or unk, which counting excludes), so the
    nonzero region is [0, 256)^2 — built with the small histogram and
    embedded; nothing quadratic in v crosses the host link.

    Checkpoint resume: the replayed corpus holds ids up to ``id_bound``
    (= 256 + replayed merges); the square embedded histogram covers
    [0, vi)^2 with vi = id_bound rounded up to the lane width."""
    from .bpe_hist import HistCorpus, init_hist
    vh = v // 128
    vi = min(v, -(-max(id_bound, 256) // 128) * 128)
    small = init_hist(HistCorpus(tw, wc), unk_id, v=vi)     # [vi, vi]
    hist4 = jnp.zeros((v, vh, 128), jnp.int32)
    hist4 = hist4.at[:vi, :vi // 128, :].set(
        small.reshape(vi, vi // 128, 128))
    rm = jnp.max(small, axis=1)                             # [vi]
    rowmax = jnp.zeros((vh, 128), jnp.int32)
    rowmax = rowmax.at[:vi // 128, :].set(rm.reshape(vi // 128, 128))
    return hist4, rowmax


def _is_resource_error(e: Exception) -> bool:
    """True for Mosaic/XLA out-of-on-chip-memory compile failures —
    deliberately narrow: anything else (layout bugs, lowering errors)
    must RAISE, not silently fall back to a slower engine."""
    msg = repr(e).lower()
    return any(k in msg for k in
               ("smem", "scalar memory", "vmem", "resource exhausted",
                "resource_exhausted", "memory exhausted",
                "exceeds available"))


def giant_train(tokens: np.ndarray, word_id: np.ndarray,
                wcount: np.ndarray, *, target_merges: int,
                unk_id: int = -1, min_pair_freq: int = 2,
                max_word_len: int = 64, steps_per_call: int = 4096,
                interpret: bool = False, progress_cb=None,
                lazy_final: bool = False, chunk_width: int | None = None,
                batch_chunks: int | None = None,
                n_prev_merges: int = 0, _cache={}):
    """Full driver: one upload, one dispatch per steps_per_call merges,
    16 bytes of readback per merge.  Returns (merges[M, 2], freqs[M],
    final tokens, final word_id) — or a lazy final_fn — or None if the
    problem is outside the engine's envelope (vocab > 32768, a word
    longer than max_word_len, unk_id >= 256, more than
    MAX_NC * chunk_width unique words — 16.7M at the default width)."""
    if chunk_width is None:
        # measured r4 (1 GB, 3.44M words, v5e): cw=2048 -> 105 s vs
        # 1024 -> 129 s; re-swept r5 after the log-depth select:
        # 2048 -> 48.7 s vs 1024 -> 57-62 s warm — 2048 stays the
        # GB-scale optimum.  The r3 16 MB sweep showed 2048 SLOWER
        # there (0.58 vs 0.36 ms/merge), so widen only for large
        # word sets
        # word_id.max() rather than word_id[-1]: callers normally pass
        # sorted word ids, but the width choice should not silently
        # degrade for an unsorted caller (ADVICE r4; perf-only either
        # way — merges are width-independent)
        n_words_est = int(word_id.max()) + 1 if len(word_id) else 0
        cw = 2 * C if n_words_est > 1_500_000 else C
    else:
        n_words_est = int(word_id.max()) + 1 if len(word_id) else 0
        cw = chunk_width
    # K chunks per kernel step was built to amortize per-VPU-pass
    # issue latency, but measured a REGRESSION at 1 GB once the
    # log-depth select landed (kb=4: 75 s vs kb=1: 46-48 s warm):
    # per-pass work already scales with total cells, so batching saves
    # nothing there, while it forfeits the per-chunk match skip — a
    # batch with ONE matching chunk pays select over all K (presence
    # flags are necessary, not sufficient, so many flagged chunks have
    # no match).  Default stays 1; the tunable and its bit-exactness
    # test remain (tests/test_giant_engine.py kb conformance).
    kb = 1 if batch_chunks is None else max(1, int(batch_chunks))
    if cw % MXU_C:
        raise ValueError(f"chunk_width must be a multiple of {MXU_C}")
    v = 256 + target_merges
    # vh = v // 128 is a sublane dimension: keep it a multiple of 8
    # (hardware (8, 128) int32 tiling), i.e. v a multiple of 1024
    v = -(-v // 1024) * 1024
    if v > MAX_V or unk_id >= 256 or len(tokens) == 0:
        return None
    lay = build_giant_layout(tokens, word_id, wcount, v, max_word_len,
                             cw=cw)
    if lay is None:
        return None
    L, W = lay.tw.shape
    NC = W // cw
    steps = max(1, min(steps_per_call, target_merges))
    vh = v // 128

    def get_giant(n_done: int):
        # the delta scatter only needs rows that can hold LIVE ids
        # (every scattered value is an id < 256 + n_done + steps); early
        # dispatches therefore compile with a small static row bound —
        # the scatter's one-hot build and dots scale with it.  The bound
        # quantizes to powers of two so a long run switches executables
        # only a few times (every switch re-lays-out the donated
        # multi-GB table buffers, which costs more than a snug bound
        # saves on the later, presence-sparse dispatches).
        need = min(vh, -(-(256 + n_done + steps) // 128))
        vh_eff = 8
        while vh_eff < need:
            vh_eff *= 2
        vh_eff = min(vh_eff, vh)
        key = (v, L, NC, steps, interpret, cw, vh_eff, kb)
        if key not in _cache:
            _cache[key] = make_giant_train(v, L, NC, steps,
                                           interpret=interpret, cw=cw,
                                           vh_eff=vh_eff, kb=kb)
        return _cache[key]

    tw = jnp.asarray(lay.tw)
    wc = jnp.asarray(lay.wc)
    presT = jnp.asarray(lay.presT)
    lens = jnp.asarray(lay.lens)
    hist4, rowmax = _giant_init_tables(tw, wc, jnp.int32(unk_id), v=v,
                                       id_bound=256 + n_prev_merges)
    nc_used = max(1, -(-lay.n_words // cw))

    # Resume: the caller replayed n_prev_merges merges into the corpus;
    # the kernel's merge counter (scal[2]) continues from there and only
    # new merges are returned (hist_train docstring contract).
    merges_np: list = []
    freqs_np: list = []
    done = 0
    while len(merges_np) + n_prev_merges < target_merges and not done:
        giant = get_giant(n_prev_merges + len(merges_np))
        allowed = target_merges - n_prev_merges - len(merges_np)
        scal = jnp.array([unk_id, min_pair_freq,
                          n_prev_merges + len(merges_np), done,
                          allowed, nc_used], jnp.int32)
        try:
            tw, hist4, presT, rowmax, mrows = giant(
                lens, scal, wc, tw, hist4, presT, rowmax)
        except Exception as e:  # noqa: BLE001 — compile-time only
            # The (1, NC) SMEM flag-scan scratch (and the scalar-prefetch
            # lens) grow with the word count; near MAX_NC they can exceed
            # the chip's scalar memory, which surfaces as a Mosaic
            # compile error rather than a layout-time bound.  Treat an
            # out-of-resource FIRST dispatch as "outside the envelope"
            # (return None so hist_train/flat take over), exactly like
            # the word-length/vocab/word-count checks above.
            if len(merges_np) == 0 and _is_resource_error(e):
                return None
            raise
        rows = np.asarray(mrows[::8, :4])       # 16 bytes per merge step
        did = rows[:, 3] != 0
        n_new = int(did.sum())
        if n_new < min(len(rows), allowed):
            done = 1
        merges_np.extend(rows[did, 0:2].tolist())
        freqs_np.extend(rows[did, 2].tolist())
        if progress_cb is not None:
            progress_cb(np.asarray(merges_np, np.int32).reshape(-1, 2),
                        np.asarray(freqs_np, np.int32))
        if n_new == 0:
            break

    n = len(merges_np)
    merges = np.asarray(merges_np, np.int32).reshape(n, 2)
    freqs = np.asarray(freqs_np, np.int32)
    final_tw = tw
    perm = lay.perm
    n_words = lay.n_words

    def final_fn():
        """Materialize the final merged corpus in ORIGINAL word order
        (one D2H transfer; undoes the length sort)."""
        twh = np.asarray(final_tw)
        cols = (twh >= 0).T                       # [W, L] valid positions
        col_lens = cols.sum(1)[:n_words]          # per sorted column
        toks_sorted = twh.T[:n_words][cols[:n_words]].astype(np.int32)
        # regroup sorted columns back to original word ids (vectorized)
        starts = np.zeros(n_words + 1, np.int64)
        np.cumsum(col_lens, out=starts[1:])
        inv = np.empty(n_words, np.int64)
        inv[perm] = np.arange(n_words)            # original -> column
        out_lens = col_lens[inv]
        ostarts = np.zeros(n_words + 1, np.int64)
        np.cumsum(out_lens, out=ostarts[1:])
        total = int(ostarts[-1])
        pos_in_word = (np.arange(total, dtype=np.int64)
                       - np.repeat(ostarts[:-1], out_lens))
        order = np.repeat(starts[inv], out_lens) + pos_in_word
        final_tokens = toks_sorted[order]
        final_word_id = np.repeat(np.arange(n_words, dtype=np.int32),
                                  out_lens)
        return final_tokens, final_word_id

    if lazy_final:
        return merges, freqs, final_fn
    return (merges, freqs, *final_fn())
