"""Histogram-engine BPE training: 2D by-word layout + maintained pair
table + fused Pallas merge kernel.

The flat-stream engine (bpe_ops.py) pays a global sort per merge.  This
engine never sorts after initialization:

  layout   tokens as int16[L, W] — one WORD PER LANE COLUMN (lane-major
           so the VPU runs full-width), PAD = -3 beyond each word
  hist     int32[V, V] exact pair counts, maintained by per-merge
           deltas; best pair via a maintained per-row max vector
           (row-major order = the documented lex tie-break)
  kernel   the FLAGSHIP path runs the ENTIRE training loop as one
           pallas_call (make_fused_train): grid = merges, pair table +
           corpus resident in VMEM scratch across grid steps, in-kernel
           pick/update — zero HBM traffic and zero host round-trips per
           merge.  Per-chunk work: match + greedy left-to-right select +
           in-column hole-march compaction + delta histograms as masked
           VPU lane-reduces, gated per chunk and per row on "any match
           here".  A per-merge-dispatch variant (make_merge_step +
           XLA while_loop) remains as the fallback when the corpus or
           table exceeds the VMEM budget.

Delta exactness (reference bpe_merge_batch accounting, bpe.cpp:437-470):
a merge of (a,b)->N at column row r destroys pair (Lval, a) and creates
(Lval, N) with the SAME weight, where Lval is the left neighbor AFTER
earlier occurrences in the same word merged (sel[r-2] override); ditto
(b, Rval)/(N, Rval) with the PRE-merge right neighbor t[r+2].  One
slot-collapse int32 histogram per side (see _slot_delta_accum)
therefore yields both the subtraction and the addition vector.  The
merged pair's own cell is zeroed (all occurrences merge: greedy
overlap rule leaves none behind).

Conformance: bit-identical merge sequences to bpe_ops.train_loop (lex
tie-break) — enforced by differential tests on random corpora.
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

ensure_jax_cache()

PAD = -3
CHUNK = 512          # lane columns per grid step (multiple of 128).
                     # Measured sweep on the 16 MB bench (v5e, r4):
                     # 256 -> 91.7 MB/s, 512 -> 102.5, 1024 -> 70.8 —
                     # wider chunks inflate the O(v*CHUNK) per-slot
                     # delta histograms faster than they amortize
                     # pass-issue overhead; narrower ones double the
                     # pass count for the same histogram work.
INT32_MAX = jnp.iinfo(jnp.int32).max


# ---------------------------------------------------------------------
# layout
# ---------------------------------------------------------------------

class HistCorpus(NamedTuple):
    tw: jax.Array      # int32[L, W] tokens, PAD beyond each word
    wcount: jax.Array  # int32[1, W] word weights (0 on padding columns)


def build_layout(tokens: np.ndarray, word_id: np.ndarray,
                 wcount: np.ndarray, max_word_len: int,
                 min_len: int = 8) -> HistCorpus | None:
    """Pack the flat dedup stream into [L, W]; None if a word exceeds
    max_word_len (caller falls back to the flat engine).

    wcount is PER WORD (length = number of words), unlike the flat
    engine's per-position convention.
    """
    if len(tokens) == 0:
        return None
    n_words = int(word_id[-1]) + 1
    lens = np.bincount(word_id, minlength=n_words)
    L = int(lens.max(initial=1))
    if L > max_word_len:
        return None
    L = max(min_len, 1 << int(np.ceil(np.log2(L))))
    W = -(-n_words // CHUNK) * CHUNK
    tw = np.full((L, W), PAD, np.int16)   # halves the (slow) H2D upload
    starts = np.zeros(n_words + 1, np.int64)
    np.cumsum(lens, out=starts[1:])
    pos = np.arange(len(tokens)) - starts[word_id]
    tw[pos, word_id] = tokens             # initial ids are bytes/unk < 256
    wc = np.zeros((1, W), np.int32)
    wc[0, :n_words] = wcount
    # host arrays: each engine uploads exactly the layout it needs once
    return HistCorpus(tw, wc)


# ---------------------------------------------------------------------
# hist init (once per training): sort-based exact count -> scatter
# ---------------------------------------------------------------------

@partial(jax.jit, static_argnames=("v",))
def init_hist(c: HistCorpus, unk_id, *, v: int) -> jax.Array:
    L, W = c.tw.shape
    tw32 = c.tw.astype(jnp.int32)         # layout stores int16
    t = tw32.reshape(-1)
    nxt = jnp.roll(tw32, -1, axis=0).at[-1].set(PAD).reshape(-1)
    w = jnp.broadcast_to(c.wcount, (L, W)).reshape(-1)
    valid = (t >= 0) & (nxt >= 0) & (t != unk_id) & (nxt != unk_id)
    key = jnp.where(valid, t * v + nxt, v * v)
    cnt = jnp.where(valid, w, 0)
    hist = jnp.zeros(v * v + 1, jnp.int32).at[key].add(cnt, mode="drop")
    return hist[:-1].reshape(v, v)


# ---------------------------------------------------------------------
# fused merge kernel
# ---------------------------------------------------------------------

def _shift_up(x, fill):
    r = pltpu.roll(x, shift=x.shape[0] - 1, axis=0)
    row = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    return jnp.where(row == x.shape[0] - 1, fill, r)


def _shift_down(x, fill):
    r = pltpu.roll(x, shift=1, axis=0)
    row = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    return jnp.where(row == 0, fill, r)


def _shift_down_k(x, k, fill):
    r = pltpu.roll(x, shift=k, axis=0)
    row = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0)
    return jnp.where(row < k, fill, r)


def _select_and_apply(tt, a, b, new, L):
    """Greedy left-to-right match selection + merge + compaction on one
    [L, C] block.  Returns (t2, sel).

    Selection closed form: within each maximal run of consecutive
    matches, greedy left-to-right picks every other one starting at the
    run head — sel = m & odd(row - last_non_match_row), with the last
    non-match row as a log-step cumulative max (4 passes at L=16
    instead of the L-pass sequential recurrence).

    Compaction: each pass removes the FIRST hole of every column (a
    cumulative-OR from the hole down, then a suffix shift-up), so the
    loop runs max-matches-per-column times (usually 1) instead of
    L - 1."""
    C = tt.shape[1]
    row = jax.lax.broadcasted_iota(jnp.int32, (L, C), 0)
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


def _slot_delta_accum(tt, sel, ww, a, b, new, unk, v, dl_ref, dr_ref):
    """Slot-collapse delta histograms over one PRE-merge [L, C] block:
    accumulates each merged occurrence's left/right neighbor weights
    (bpe_merge_batch accounting, bpe.cpp:437-470) into [v, 1] int32
    columns.

    Selected positions are partitioned by their per-column match
    ordinal (1st/2nd/... match in the word), giving [1, C] value/weight
    vectors per slot — one O(v*C) histogram body per ACTIVE slot
    (usually one) instead of one per matching ROW (~4).  Histograms run
    as masked VPU lane-reduces in pure int32 — exact for any corpus
    mass (an earlier MXU one-hot-matmul variant was both ~5x slower at
    tiny N and inexact on hardware: Mosaic's default dot truncates f32
    inputs to bf16).  Both sides accumulate as [v, 1] columns; the
    right side is transposed once per merge by the table update.

    The v dimension runs in 128-row blocks skipped above the live-id
    bound: every neighbor value is <= `new` (ids above the merge being
    created cannot occur yet), so blocks with base > new contribute
    nothing — exact, and ~v/live cheaper early in training."""
    L, C = tt.shape
    nb, RB = (v // 128, 128) if v % 128 == 0 and v > 128 else (1, v)
    sel2 = _shift_down(_shift_down(sel, 0), 0)
    t_up = _shift_down(tt, PAD)                      # t[r-1]
    lval = t_up + sel2 * (new - t_up)                # override: earlier
    rval = _shift_up(_shift_up(tt, PAD), PAD)        # t[r+2], pre-merge
    wsel = sel * ww
    wl = jnp.where((lval >= 0) & (lval != unk), wsel, 0)
    wr = jnp.where((rval >= 0) & (rval != unk), wsel, 0)
    cs = sel
    sh = 1
    while sh < L:                                    # inclusive prefix sum
        r = pltpu.roll(cs, shift=sh, axis=0)
        rowi = jax.lax.broadcasted_iota(jnp.int32, (L, C), 0)
        cs = cs + jnp.where(rowi >= sh, r, 0)
        sh *= 2
    for k in range(L // 2):
        slot = (sel != 0) & (cs == k + 1)

        @pl.when(jnp.any(slot))
        def _(slot=slot):
            lv = jnp.sum(jnp.where(slot, lval, 0), axis=0,
                         keepdims=True)                           # [1, C]
            lw = jnp.sum(jnp.where(slot, wl, 0), axis=0,
                         keepdims=True)
            rv = jnp.sum(jnp.where(slot, rval, 0), axis=0,
                         keepdims=True)
            rw = jnp.sum(jnp.where(slot, wr, 0), axis=0,
                         keepdims=True)
            lwb = jnp.broadcast_to(lw, (RB, C))
            rwb = jnp.broadcast_to(rw, (RB, C))
            for kb in range(nb):
                base = kb * RB

                @pl.when(base <= new)
                def _(base=base):
                    iota_bc = (jax.lax.broadcasted_iota(
                        jnp.int32, (RB, C), 0) + base)
                    dl_ref[base:base + RB, :] += jnp.sum(
                        jnp.where(iota_bc == lv, lwb, 0), axis=1,
                        keepdims=True)                            # [RB, 1]
                    dr_ref[base:base + RB, :] += jnp.sum(
                        jnp.where(iota_bc == rv, rwb, 0), axis=1,
                        keepdims=True)


def apply_hist_updates(hist, a, b, new, dl, dr):
    """The five exact table updates shared by every train loop:
    column a/new from the left-side vector, row b/new from the
    right-side vector, merged cell zeroed."""
    hist = hist.at[:, a].add(-dl)
    hist = hist.at[:, new].add(dl)
    hist = hist.at[b, :].add(-dr)
    hist = hist.at[new, :].add(dr)
    return hist.at[a, b].set(0)


def _merge_kernel(v: int, L: int, scal_ref, t_ref, w_ref,
                  tout_ref, dl_ref, dr_ref, nm_ref):
    a = scal_ref[0]
    b = scal_ref[1]
    new = scal_ref[2]
    unk = scal_ref[3]
    tt = t_ref[:].astype(jnp.int32)                  # [L, C] (i16 in HBM)
    ww = w_ref[:]                                    # [1, C]

    t2, sel = _select_and_apply(tt, a, b, new, L)
    tout_ref[:] = t2.astype(jnp.int16)

    @pl.when(pl.program_id(0) == 0)
    def _():
        dl_ref[:] = jnp.zeros_like(dl_ref)
        dr_ref[:] = jnp.zeros_like(dr_ref)
        nm_ref[0, 0] = 0

    n_match = jnp.sum(sel)
    nm_ref[0, 0] += n_match

    @pl.when(n_match > 0)
    def _():
        _slot_delta_accum(tt, sel, ww, a, b, new, unk, v, dl_ref, dr_ref)


def _merge_kernel_sparse(v: int, L: int, flags_ref, scal_ref,
                         t_hbm, w_hbm, pres_in, tout_hbm, pres_out,
                         dl_ref, dr_ref, nm_ref):
    # pres_in is only read through its alias pres_out (rows of skipped
    # chunks stay in place); the parameter exists for the aliasing.
    del pres_in
    """Chunk-skipping variant: tokens live as int16 in HBM, aliased
    in-place; chunks whose presence bitmap lacks a or b are never
    DMA'd.  pres_out rows are refreshed for processed chunks."""
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        dl_ref[:] = jnp.zeros_like(dl_ref)
        dr_ref[:] = jnp.zeros_like(dr_ref)
        nm_ref[0, 0] = 0

    @pl.when(flags_ref[i] != 0)
    def _():
        def inner(tbuf, wbuf, pbuf, sem_t, sem_w, sem_o, sem_p):
            cp_t = pltpu.make_async_copy(
                t_hbm.at[:, pl.ds(i * CHUNK, CHUNK)], tbuf, sem_t)
            cp_w = pltpu.make_async_copy(
                w_hbm.at[:, pl.ds(i * CHUNK, CHUNK)], wbuf, sem_w)
            cp_t.start()
            cp_w.start()
            cp_t.wait()
            cp_w.wait()

            a = scal_ref[0]
            b = scal_ref[1]
            new = scal_ref[2]
            unk = scal_ref[3]
            tt = tbuf[:].astype(jnp.int32)
            ww = wbuf[:]

            t2, sel = _select_and_apply(tt, a, b, new, L)
            nm_ref[0, 0] += jnp.sum(sel)

            _slot_delta_accum(tt, sel, ww, a, b, new, unk, v,
                              dl_ref, dr_ref)

            iota_v = jax.lax.broadcasted_iota(jnp.int32, (CHUNK, v), 1)
            pres = jnp.zeros((1, v), jnp.int32)
            for l in range(L):
                here = (t2[l][:, None] == iota_v).astype(jnp.int32)
                pres = jnp.maximum(pres, jnp.max(here, axis=0)[None, :])

            tbuf[:] = t2.astype(jnp.int16)
            # presence rows are stored 8-deep: HBM slices must align to
            # the (8, 128) int32 tiling, so a [1, V] row DMA is illegal
            pbuf[:] = jnp.broadcast_to(pres, (8, v))
            cp_o = pltpu.make_async_copy(
                tbuf, tout_hbm.at[:, pl.ds(i * CHUNK, CHUNK)], sem_o)
            cp_p = pltpu.make_async_copy(pbuf, pres_out.at[i], sem_p)
            cp_o.start()
            cp_p.start()
            cp_o.wait()
            cp_p.wait()

        pl.run_scoped(
            inner,
            tbuf=pltpu.VMEM((L, CHUNK), jnp.int16),
            wbuf=pltpu.VMEM((1, CHUNK), jnp.int32),
            pbuf=pltpu.VMEM((8, v), jnp.int32),
            sem_t=pltpu.SemaphoreType.DMA(()),
            sem_w=pltpu.SemaphoreType.DMA(()),
            sem_o=pltpu.SemaphoreType.DMA(()),
            sem_p=pltpu.SemaphoreType.DMA(()),
        )


def make_merge_step_sparse(v: int, L: int, W: int,
                           interpret: bool = False):
    """Chunk-skipping merge step over int16 tokens.

    merge_step(tw_i16, wcount, presence, flags, scal) ->
        (tw_i16', presence', dl, dr, nm)

    tw and presence are updated in place (donated/aliased); skipped
    chunks keep their bytes without any DMA.
    """
    grid = W // CHUNK
    kernel = partial(_merge_kernel_sparse, v, L)

    @jax.jit
    def merge_step(tw, wcount, presence, flags, scal):
        return pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=2,          # flags, scal
                grid=(grid,),
                in_specs=[
                    pl.BlockSpec(memory_space=pl.ANY),   # t_hbm
                    pl.BlockSpec(memory_space=pl.ANY),   # w_hbm
                    pl.BlockSpec(memory_space=pl.ANY),   # presence_in
                ],
                out_specs=[
                    pl.BlockSpec(memory_space=pl.ANY),   # tout
                    pl.BlockSpec(memory_space=pl.ANY),   # presence
                    pl.BlockSpec((v, 1), lambda i, *s: (0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((v, 1), lambda i, *s: (0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, 1), lambda i, *s: (0, 0),
                                 memory_space=pltpu.SMEM),
                ],
            ),
            out_shape=[
                jax.ShapeDtypeStruct((L, W), jnp.int16),
                jax.ShapeDtypeStruct((W // CHUNK, 8, v), jnp.int32),
                jax.ShapeDtypeStruct((v, 1), jnp.int32),
                jax.ShapeDtypeStruct((v, 1), jnp.int32),
                jax.ShapeDtypeStruct((1, 1), jnp.int32),
            ],
            # args order: flags, scal, tw, wcount, presence
            input_output_aliases={2: 0, 4: 1},
            interpret=interpret,
            compiler_params=None if interpret else pltpu.CompilerParams(
                has_side_effects=True),
        )(flags, scal, tw, wcount, presence)

    return merge_step


def build_presence(tw: np.ndarray, v: int) -> np.ndarray:
    """int32[n_chunks, 8, V]: 1 iff token occurs in the chunk (host-side,
    once; the kernel keeps it fresh for processed chunks).  Rows are
    stored 8-deep so per-chunk DMA slices satisfy the (8, 128) int32
    tiling; all 8 rows carry the same bitmap."""
    L, W = tw.shape
    n_chunks = W // CHUNK
    pres = np.zeros((n_chunks, 8, v), np.int32)
    for i in range(n_chunks):
        vals = np.unique(tw[:, i * CHUNK:(i + 1) * CHUNK])
        vals = vals[(vals >= 0) & (vals < v)]
        pres[i, :, vals] = 1
    return pres


def make_merge_step(v: int, L: int, W: int, interpret: bool = False):
    grid = W // CHUNK
    kernel = partial(_merge_kernel, v, L)

    @jax.jit
    def merge_step(tw, wcount, scal):
        return pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(grid,),
                in_specs=[
                    pl.BlockSpec((L, CHUNK), lambda i, s: (0, i),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, CHUNK), lambda i, s: (0, i),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=[
                    pl.BlockSpec((L, CHUNK), lambda i, s: (0, i),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((v, 1), lambda i, s: (0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((v, 1), lambda i, s: (0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((1, 1), lambda i, s: (0, 0),
                                 memory_space=pltpu.SMEM),
                ],
            ),
            out_shape=[
                jax.ShapeDtypeStruct((L, W), jnp.int16),
                jax.ShapeDtypeStruct((v, 1), jnp.int32),
                jax.ShapeDtypeStruct((v, 1), jnp.int32),
                jax.ShapeDtypeStruct((1, 1), jnp.int32),
            ],
            interpret=interpret,
        )(scal, tw, wcount)

    return merge_step


# ---------------------------------------------------------------------
# fused whole-training kernel: hist + corpus resident in VMEM
# ---------------------------------------------------------------------
#
# The while_loop engine below pays ~1.4 ms/merge of XLA overhead around
# a ~0.4 ms merge pass (argmax over the [V, V] table, scatter updates,
# loop-state plumbing — measured on a v5e).  This kernel runs the ENTIRE
# merge loop as one pallas_call: grid = (max_merges,), the pair table
# and the corpus live in VMEM scratch across grid steps, and the
# argmax/update happen in-kernel.  Per-merge HBM traffic: zero.
#
# Layout: corpus as int16[NC, L, CHUNK] (leading dim = chunk so loads
# use supported leading-dim dynamic indexing), weights int32[NC, 1,
# CHUNK], hist int32[V, V].  Fits when hist + corpus + weights stay
# under the VMEM budget (~12 MB of the ~16 MB/core); larger problems
# fall back to the while_loop engine.

_RB = 128          # hist row block for the in-kernel argmax/update


def _fused_kernel(v: int, L: int, NC: int, fc: int, scal_ref, w_ref,
                  t_hbm, h_hbm, tw_ref, hist_ref, mrow_ref,
                  done_s, rowmax_s, dl_ref, dr_ref, sem_t, sem_h):
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        done_s[0] = scal_ref[3]
        cp_t = pltpu.make_async_copy(t_hbm, tw_ref, sem_t)
        cp_h = pltpu.make_async_copy(h_hbm, hist_ref, sem_h)
        cp_t.start()
        cp_h.start()
        cp_t.wait()
        cp_h.wait()
        rowmax_s[:] = jnp.max(hist_ref[:], axis=1, keepdims=True)

    unk = scal_ref[0]
    min_freq = scal_ref[1]
    new = 256 + scal_ref[2] + i

    # ---- pick: the maintained per-row max vector makes this O(v), not
    # O(v*v); the full-table pass happens only inside the update below
    # (fused with rowmax maintenance).  Tie-break: smallest row, then
    # smallest column — the documented row-major/lex rule.
    rm = rowmax_s[:]                                       # [v, 1]
    rmm = jnp.where(rm >= min_freq, rm, 0)
    m = jnp.max(rmm)
    riota = jax.lax.broadcasted_iota(jnp.int32, (v, 1), 0)
    a = jnp.min(jnp.where(rmm == m, riota, INT32_MAX))
    do = (m > 0) & (done_s[0] == 0) & (i < scal_ref[4])
    a = jnp.where(do, a, 0)                                # safe slice base
    r0 = (a // 8) * 8
    blk = hist_ref[pl.ds(r0, 8), :]                        # [8, v]
    rsel = jax.lax.broadcasted_iota(jnp.int32, (8, v), 0) == a - r0
    ciota = jax.lax.broadcasted_iota(jnp.int32, (8, v), 1)
    b = jnp.min(jnp.where(rsel & (blk == m), ciota, INT32_MAX))
    b = jnp.where(do, b, 0)

    lane = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
    rec = (jnp.where(lane == 0, a, 0) + jnp.where(lane == 1, b, 0)
           + jnp.where(lane == 2, m, 0)
           + jnp.where(lane == 3, do.astype(jnp.int32), 0))
    mrow_ref[:] = rec

    @pl.when(jnp.logical_not(do))
    def _():
        done_s[0] = 1          # sticky: merging never revives a pair

    @pl.when(do)
    def _():
        _corpus_pass(v, L, NC, fc, tw_ref, w_ref, dl_ref, dr_ref,
                     a, b, new, unk)

        # ---- table update (apply_hist_updates semantics) in ONE
        # full-table pass, with the rowmax vector refreshed in the same
        # pass — the only O(v*v) work per merge.  dr accumulated as a
        # column; one identity matmul transposes it to row layout
        # (Mosaic cannot reshape/transpose across sublanes and lanes).
        # Row blocks above the live-id bound are skipped: their dl is
        # zero and they cannot be row b or `new`, so they are unchanged
        # (and their rowmax entries stay valid).
        rows2 = jax.lax.broadcasted_iota(jnp.int32, (v, v), 0)
        cols2 = jax.lax.broadcasted_iota(jnp.int32, (v, v), 1)
        ident = (rows2 == cols2).astype(jnp.float32)
        dri = _col_to_row_i32(dr_ref[:], ident)                    # [1, v]
        nb2, RB2 = (v // 128, 128) if v % 128 == 0 and v > 128 else (1, v)
        for kb in range(nb2):
            base = kb * RB2

            @pl.when(base <= new)
            def _(base=base):
                rowsb = (jax.lax.broadcasted_iota(
                    jnp.int32, (RB2, v), 0) + base)
                colsb = jax.lax.broadcasted_iota(jnp.int32, (RB2, v), 1)
                dlb = dl_ref[base:base + RB2, :]                   # [RB, 1]
                h2 = (hist_ref[base:base + RB2, :]
                      + (jnp.where(colsb == a, -1, 0)
                         + jnp.where(colsb == new, 1, 0)) * dlb
                      + (jnp.where(rowsb == b, -1, 0)
                         + jnp.where(rowsb == new, 1, 0)) * dri)
                h2 = jnp.where((rowsb == a) & (colsb == b), 0, h2)
                hist_ref[base:base + RB2, :] = h2
                rowmax_s[base:base + RB2, :] = jnp.max(
                    h2, axis=1, keepdims=True)


def _col_to_row_i32(col, ident):
    """Exact int32 [n, 1] -> [1, n] transpose: hi/lo 15-bit split, two
    HIGHEST-precision identity dots (each part < 2^15 so the f32
    conversion and f32x3 MXU passes are exact), recombined in int32.
    A single default-precision dot truncates to bf16 and a single f32
    dot rounds above 2^24."""
    lo = (col & 0x7FFF).astype(jnp.float32)
    hi = (col >> 15).astype(jnp.float32)
    dims = (((0,), (0,)), ((), ()))
    lo_t = jax.lax.dot_general(lo, ident, dims,
                               precision=jax.lax.Precision.HIGHEST,
                               preferred_element_type=jnp.float32)
    hi_t = jax.lax.dot_general(hi, ident, dims,
                               precision=jax.lax.Precision.HIGHEST,
                               preferred_element_type=jnp.float32)
    return hi_t.astype(jnp.int32) * 32768 + lo_t.astype(jnp.int32)


def _corpus_pass(v: int, L: int, NC: int, fc: int, tw_ref, w_ref,
                 dl_ref, dr_ref, a, b, new, unk):
    """Shared merge-apply + delta accumulation over the VMEM-resident
    corpus: zeroes the [v, 1] dl/dr scratch then adds each merged
    occurrence's left/right neighbor weights (bpe_merge_batch
    accounting, bpe.cpp:437-470)."""
    dl_ref[:] = jnp.zeros_like(dl_ref)
    dr_ref[:] = jnp.zeros_like(dr_ref)

    def chunk_body(c, carry):
        tt = tw_ref[c].astype(jnp.int32)
        nxt0 = _shift_up(tt, PAD)
        mm = (tt == a) & (nxt0 == b)

        @pl.when(jnp.any(mm))
        def _():
            t2, sel = _select_and_apply(tt, a, b, new, L)
            tw_ref[c] = t2.astype(jnp.int16)
            _slot_delta_accum(tt, sel, w_ref[c], a, b, new, unk, v,
                              dl_ref, dr_ref)
        return carry

    jax.lax.fori_loop(0, NC, chunk_body, 0)


def make_fused_train(v: int, L: int, NC: int, steps: int,
                     fc: int = CHUNK, interpret: bool = False):
    """One pallas_call = `steps` greedy merges.

    fused(tw3, wc3, hist, scal) -> (tw3', hist', mrows)

    tw3 int16[NC, L, CHUNK]; wc3 int32[NC, 1, CHUNK]; hist int32[v, v];
    scal int32[5] = (unk_id, min_pair_freq, n_done, init_done,
    steps_allowed — merges this call may still perform, caps the grid).
    mrows int32[steps * 8, 128]: step k's record lives at row 8k, lanes
    (a, b, freq, did_merge); rows after exhaustion have did_merge == 0
    (the 8-row depth satisfies the (8, 128) int32 block tiling).
    """
    kernel = partial(_fused_kernel, v, L, NC, fc)

    @jax.jit
    def fused(tw3, wc3, hist, scal):
        return pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(steps,),
                in_specs=[
                    pl.BlockSpec((NC, 1, fc), lambda i, s: (0, 0, 0),
                                 memory_space=pltpu.VMEM),       # weights
                    pl.BlockSpec(memory_space=pl.ANY),           # tw (HBM)
                    pl.BlockSpec(memory_space=pl.ANY),           # hist (HBM)
                ],
                out_specs=[
                    pl.BlockSpec((NC, L, fc), lambda i, s: (0, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((v, v), lambda i, s: (0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((8, 128), lambda i, s: (i, 0),
                                 memory_space=pltpu.VMEM),
                ],
                scratch_shapes=[
                    pltpu.SMEM((1,), jnp.int32),                 # done
                    pltpu.VMEM((v, 1), jnp.int32),               # rowmax
                    pltpu.VMEM((v, 1), jnp.int32),               # dl
                    pltpu.VMEM((v, 1), jnp.int32),               # dr
                    pltpu.SemaphoreType.DMA(()),
                    pltpu.SemaphoreType.DMA(()),
                ],
            ),
            out_shape=[
                jax.ShapeDtypeStruct((NC, L, fc), jnp.int16),
                jax.ShapeDtypeStruct((v, v), jnp.int32),
                jax.ShapeDtypeStruct((steps * 8, 128), jnp.int32),
            ],
            # args order: scal, wc3, tw3, hist
            input_output_aliases={2: 0, 3: 1},
            interpret=interpret,
            compiler_params=None if interpret else pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
                has_side_effects=True),
        )(scal, wc3, tw3, hist)

    return fused


# ---------------------------------------------------------------------
# big-vocab fused kernel: pair table in HBM, streamed per-merge update
# ---------------------------------------------------------------------
#
# For v > ~1280 the [v, v] table no longer fits VMEM next to the corpus.
# This variant keeps the table in HBM (aliased in place) and streams it
# through a [RB, v] VMEM buffer once per merge for the update + rowmax
# refresh; the pick still runs on the VMEM-resident rowmax vector, and
# the corpus pass is the shared slot-collapse _corpus_pass.  Per-merge
# HBM traffic: 2 * v * v * 4 bytes (read + write) — ~0.3 ms at v=2048.


def _fused_kernel_big(v: int, L: int, NC: int, fc: int, RB: int,
                      scal_ref, w_ref, t_hbm, h_in,
                      tw_ref, h_io, mrow_ref,
                      done_s, rowmax_s, dl_ref, dr_ref, drrow_s,
                      rowbuf, bbuf, sem_t, sem_u, sem_b):
    # h_in is only accessed through its alias h_io (in-place table).
    del h_in
    i = pl.program_id(0)
    nb = v // RB

    @pl.when(i == 0)
    def _():
        done_s[0] = scal_ref[3]
        cp_t = pltpu.make_async_copy(t_hbm, tw_ref, sem_t)
        cp_t.start()
        cp_t.wait()

        def init_blk(kb, carry):
            cp = pltpu.make_async_copy(
                h_io.at[pl.ds(kb * RB, RB), :], rowbuf, sem_u)
            cp.start()
            cp.wait()
            rowmax_s[pl.ds(kb * RB, RB), :] = jnp.max(
                rowbuf[:], axis=1, keepdims=True)
            return carry

        jax.lax.fori_loop(0, nb, init_blk, 0)

    unk = scal_ref[0]
    min_freq = scal_ref[1]
    new = 256 + scal_ref[2] + i

    # ---- pick from the maintained rowmax vector (same tie-break as the
    # VMEM-resident kernel: smallest row, then smallest column)
    rm = rowmax_s[:]                                       # [v, 1]
    rmm = jnp.where(rm >= min_freq, rm, 0)
    m = jnp.max(rmm)
    riota = jax.lax.broadcasted_iota(jnp.int32, (v, 1), 0)
    a = jnp.min(jnp.where(rmm == m, riota, INT32_MAX))
    do = (m > 0) & (done_s[0] == 0) & (i < scal_ref[4])
    a = jnp.where(do, a, 0)                                # safe slice base
    r0 = (a // 8) * 8
    cp_b = pltpu.make_async_copy(h_io.at[pl.ds(r0, 8), :], bbuf, sem_b)
    cp_b.start()
    cp_b.wait()
    blk = bbuf[:]                                          # [8, v]
    rsel = jax.lax.broadcasted_iota(jnp.int32, (8, v), 0) == a - r0
    ciota = jax.lax.broadcasted_iota(jnp.int32, (8, v), 1)
    b = jnp.min(jnp.where(rsel & (blk == m), ciota, INT32_MAX))
    b = jnp.where(do, b, 0)

    lane = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
    rec = (jnp.where(lane == 0, a, 0) + jnp.where(lane == 1, b, 0)
           + jnp.where(lane == 2, m, 0)
           + jnp.where(lane == 3, do.astype(jnp.int32), 0))
    mrow_ref[:] = rec

    @pl.when(jnp.logical_not(do))
    def _():
        done_s[0] = 1          # sticky: merging never revives a pair

    @pl.when(do)
    def _():
        _corpus_pass(v, L, NC, fc, tw_ref, w_ref, dl_ref, dr_ref,
                     a, b, new, unk)

        # dr column -> row layout, 128 lanes at a time (exact identity
        # dots; Mosaic cannot transpose across sublanes/lanes directly)
        i128 = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 0)
        j128 = jax.lax.broadcasted_iota(jnp.int32, (128, 128), 1)
        ident = (i128 == j128).astype(jnp.float32)
        for k in range(v // 128):
            db = _col_to_row_i32(dr_ref[pl.ds(k * 128, 128), :], ident)
            drrow_s[0:1, k * 128:(k + 1) * 128] = db       # [1, 128]

        # ---- streamed table update (apply_hist_updates semantics) +
        # rowmax refresh, one [RB, v] block at a time, in place
        dri = drrow_s[0:1, :]                              # [1, v]

        def upd_blk(kb, carry):
            rb0 = kb * RB
            cp_in = pltpu.make_async_copy(
                h_io.at[pl.ds(rb0, RB), :], rowbuf, sem_u)
            cp_in.start()
            cp_in.wait()
            rows_b = jax.lax.broadcasted_iota(jnp.int32, (RB, v), 0) + rb0
            cols_b = jax.lax.broadcasted_iota(jnp.int32, (RB, v), 1)
            dlb = dl_ref[pl.ds(rb0, RB), :].astype(jnp.int32)  # [RB, 1]
            h2 = (rowbuf[:]
                  + (jnp.where(cols_b == a, -1, 0)
                     + jnp.where(cols_b == new, 1, 0)) * dlb
                  + (jnp.where(rows_b == b, -1, 0)
                     + jnp.where(rows_b == new, 1, 0)) * dri)
            h2 = jnp.where((rows_b == a) & (cols_b == b), 0, h2)
            rowbuf[:] = h2
            rowmax_s[pl.ds(rb0, RB), :] = jnp.max(h2, axis=1,
                                                  keepdims=True)
            cp_out = pltpu.make_async_copy(
                rowbuf, h_io.at[pl.ds(rb0, RB), :], sem_u)
            cp_out.start()
            cp_out.wait()
            return carry

        jax.lax.fori_loop(0, nb, upd_blk, 0)


def make_fused_train_big(v: int, L: int, NC: int, steps: int,
                         fc: int = CHUNK, rb: int = 128,
                         interpret: bool = False):
    """make_fused_train with the pair table in HBM — same signature and
    record format; use for 1280 < v <= 4096 (see fused_hist_train)."""
    kernel = partial(_fused_kernel_big, v, L, NC, fc, rb)

    @jax.jit
    def fused(tw3, wc3, hist, scal):
        return pl.pallas_call(
            kernel,
            grid_spec=pltpu.PrefetchScalarGridSpec(
                num_scalar_prefetch=1,
                grid=(steps,),
                in_specs=[
                    pl.BlockSpec((NC, 1, fc), lambda i, s: (0, 0, 0),
                                 memory_space=pltpu.VMEM),       # weights
                    pl.BlockSpec(memory_space=pl.ANY),           # tw (HBM)
                    pl.BlockSpec(memory_space=pl.ANY),           # hist HBM
                ],
                out_specs=[
                    pl.BlockSpec((NC, L, fc), lambda i, s: (0, 0, 0),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec(memory_space=pl.ANY),           # hist out
                    pl.BlockSpec((8, 128), lambda i, s: (i, 0),
                                 memory_space=pltpu.VMEM),
                ],
                scratch_shapes=[
                    pltpu.SMEM((1,), jnp.int32),                 # done
                    pltpu.VMEM((v, 1), jnp.int32),               # rowmax
                    pltpu.VMEM((v, 1), jnp.int32),               # dl
                    pltpu.VMEM((v, 1), jnp.int32),               # dr
                    pltpu.VMEM((8, v), jnp.int32),               # dr row
                    pltpu.VMEM((rb, v), jnp.int32),              # stream buf
                    pltpu.VMEM((8, v), jnp.int32),               # b row blk
                    pltpu.SemaphoreType.DMA(()),
                    pltpu.SemaphoreType.DMA(()),
                    pltpu.SemaphoreType.DMA(()),
                ],
            ),
            out_shape=[
                jax.ShapeDtypeStruct((NC, L, fc), jnp.int16),
                jax.ShapeDtypeStruct((v, v), jnp.int32),
                jax.ShapeDtypeStruct((steps * 8, 128), jnp.int32),
            ],
            # args order: scal, wc3, tw3, hist
            input_output_aliases={2: 0, 3: 1},
            interpret=interpret,
            compiler_params=None if interpret else pltpu.CompilerParams(
                dimension_semantics=("arbitrary",),
                has_side_effects=True),
        )(scal, wc3, tw3, hist)

    return fused


def _fused_vmem_bytes(v: int, L: int, NC: int, fc: int) -> int:
    """Resident VMEM estimate: corpus + weights (sublane-padded to 8) +
    hist + dl scratch (lane-padded to 128) + ~3 MB of transients."""
    return (NC * L * fc * 2 + NC * 8 * fc * 4 + v * v * 4
            + v * 128 * 4 + 3 * 2**20)


def _fused_big_vmem_bytes(v: int, L: int, NC: int, fc: int,
                          rb: int = 256) -> int:
    """Big-variant estimate: corpus + weights + rowmax/dl/dr columns
    (lane-padded to 128) + stream/row buffers + ~3 MB of transients."""
    return (NC * L * fc * 2 + NC * 8 * fc * 4 + 3 * v * 128 * 4
            + rb * v * 4 + 16 * v * 4 + 3 * 2**20)


FUSED_CHUNK = 2048    # lane width of the fused kernel's in-VMEM chunks
# 2048 benched ~20% faster than 512 at bench scale with the slot-collapse
# delta pass (fewer fori_loop iterations per corpus sweep; the [v, fc]
# histogram bodies stream through vregs, so wider lanes cost no extra
# VMEM residency) — verified exact on hardware at v=1280 and v=4096.
FUSED_VMEM_BUDGET = 12 * 2**20


def _hist_from_3d(tw3, wc3, unk_id, v: int):
    """Initial pair table from the [NC, L, fc] layout (adjacency is
    along axis 1 within each chunk column) — init_hist semantics."""
    t = tw3.astype(jnp.int32)
    nxt = jnp.roll(t, -1, axis=1).at[:, -1].set(PAD)
    w = jnp.broadcast_to(wc3, t.shape)
    valid = (t >= 0) & (nxt >= 0) & (t != unk_id) & (nxt != unk_id)
    key = jnp.where(valid, t * v + nxt, v * v).reshape(-1)
    cnt = jnp.where(valid, w, 0).reshape(-1)
    hist = jnp.zeros(v * v + 1, jnp.int32).at[key].add(cnt, mode="drop")
    return hist[:-1].reshape(v, v)


def fused_hist_train(c: HistCorpus, v: int, *, target_merges: int,
                     unk_id: int, min_pair_freq: int,
                     steps_per_call: int, interpret: bool = False,
                     progress_cb=None, n_prev: int = 0, _cache={}):
    """Drive make_fused_train to target_merges; returns a HistTrainState
    (corpus back in [L, W] int32 layout) or None if it does not fit.

    The whole first call — initial pair count, every merge, and the
    16-byte-per-merge record slice — is ONE device dispatch: through a
    tunneled TPU each host<->device round-trip costs ~30 ms, so the
    driver is built around exactly one upload, one dispatch, and one
    tiny readback in the common (single-call) case."""
    L, W = c.tw.shape
    fc = FUSED_CHUNK
    W2 = -(-W // fc) * fc
    NC = W2 // fc
    if L % 8:
        return None
    if _fused_vmem_bytes(v, L, NC, fc) <= FUSED_VMEM_BUDGET:
        variant = "small"                   # table resident in VMEM
    elif (v <= 4096
          and _fused_big_vmem_bytes(v, L, NC, fc) <= FUSED_VMEM_BUDGET):
        variant = "big"                     # table streamed from HBM
    else:
        return None
    # steps is canonically steps_per_call, NOT min(steps, target): the
    # kernel already masks excess grid steps via scal[4] (allowed) and
    # the sticky done flag, so a 144-merge config compiles the SAME
    # executable as a 500-merge one at equal (v, L, NC) — through the
    # tunnel each distinct executable costs minutes per process
    # (BASELINE "Process startup"), so kernel-count frugality matters
    # more than the ~microseconds of masked no-op grid steps.
    steps = max(1, steps_per_call)
    key = ("fused", variant, v, L, NC, steps, interpret)
    if key not in _cache:
        if variant == "small":
            fused = make_fused_train(v, L, NC, steps, fc=fc,
                                     interpret=interpret)
        else:
            rb = 256 if (v % 256 == 0 and v <= 2048) else 128
            fused = make_fused_train_big(v, L, NC, steps, fc=fc, rb=rb,
                                         interpret=interpret)

        @jax.jit
        def first_call(tw3, wc3, scal):
            hist = _hist_from_3d(tw3, wc3, scal[0], v)
            tw3o, histo, mrows = fused(tw3, wc3, hist, scal)
            return tw3o, histo, mrows[::8, :4]

        @jax.jit
        def cont_call(tw3, wc3, hist, scal):
            tw3o, histo, mrows = fused(tw3, wc3, hist, scal)
            return tw3o, histo, mrows[::8, :4]

        _cache[key] = (first_call, cont_call)
    first_call, cont_call = _cache[key]

    # 3D layout built host-side: one upload of exactly what the kernel
    # reads (int16 tokens + int32 per-column weights)
    tw_np = np.asarray(c.tw)
    wc_np = np.asarray(c.wcount)
    if W2 != W:   # pad columns: PAD tokens, zero weight
        tw_np = np.pad(tw_np, ((0, 0), (0, W2 - W)),
                       constant_values=PAD)
        wc_np = np.pad(wc_np, ((0, 0), (0, W2 - W)))
    tw3 = jnp.asarray(np.ascontiguousarray(
        tw_np.reshape(L, NC, fc).transpose(1, 0, 2)))
    wc3 = jnp.asarray(np.ascontiguousarray(
        wc_np.reshape(1, NC, fc).transpose(1, 0, 2)))

    # Resume support: n_prev previously learned merges were already
    # REPLAYED into the corpus by the caller; the kernel's merge
    # counter starts at n_prev so new ids continue at 256 + n_prev
    # (the kernel derives new_id from scal[2]).  Only NEW merges are
    # returned.
    merges_np = []
    freqs_np = []
    done = 0
    hist = None
    while len(merges_np) + n_prev < target_merges and not done:
        allowed = target_merges - n_prev - len(merges_np)
        scal = jnp.array([unk_id, min_pair_freq,
                          n_prev + len(merges_np), done,
                          allowed], jnp.int32)
        if hist is None:
            tw3, hist, recs = first_call(tw3, wc3, scal)
        else:
            tw3, hist, recs = cont_call(tw3, wc3, hist, scal)
        rows = np.asarray(recs)             # 16 bytes per merge step
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
    # stays on device: [NC, L, C] -> [L, W]; materialized only if the
    # caller extracts the final corpus (the tunnel D2H is the slow part)
    tw = jnp.transpose(tw3, (1, 0, 2)).reshape(L, W2)[:, :W]
    # merges/freqs/n are HOST values here (decoded from the per-step
    # record readback) — return them as numpy so the caller's
    # int(n_merges) / np.asarray(merges) are free instead of three
    # device round-trips (~25 ms each through a tunneled TPU).
    return HistTrainState(
        corpus=HistCorpus(tw, c.wcount),
        hist=hist,
        merges=np.asarray(merges_np, np.int32).reshape(n, 2),
        merge_freqs=np.asarray(freqs_np, np.int32),
        n_merges=np.int32(n),
        done=np.bool_(bool(done)),
    )


# ---------------------------------------------------------------------
# training loop
# ---------------------------------------------------------------------

class HistTrainState(NamedTuple):
    corpus: HistCorpus
    hist: jax.Array         # int32[V, V]
    merges: jax.Array       # int32[M_max, 2]
    merge_freqs: jax.Array  # int32[M_max]
    n_merges: jax.Array     # int32
    done: jax.Array         # bool


def hist_train_init(c: HistCorpus, unk_id: int, max_merges: int,
                    v: int) -> HistTrainState:
    return HistTrainState(
        corpus=c,
        hist=init_hist(c, jnp.int32(unk_id), v=v),
        merges=jnp.zeros((max_merges, 2), jnp.int32),
        merge_freqs=jnp.zeros(max_merges, jnp.int32),
        n_merges=jnp.int32(0),
        done=jnp.bool_(False),
    )


def make_train_loop(v: int, L: int, W: int, *, target_merges: int,
                    max_steps: int, interpret: bool = False):
    merge_step = make_merge_step(v, L, W, interpret=interpret)

    @jax.jit
    def train_loop(ts: HistTrainState, unk_id, min_pair_freq):
        def cond_fn(carry):
            ts, steps = carry
            return ((~ts.done) & (ts.n_merges < target_merges)
                    & (steps < max_steps))

        def body_fn(carry):
            ts, steps = carry
            flat = ts.hist.reshape(-1)
            masked = jnp.where(flat >= min_pair_freq, flat, 0)
            best = jnp.argmax(masked)
            cnt = masked[best]
            a = (best // v).astype(jnp.int32)
            b = (best % v).astype(jnp.int32)

            def do_merge(ts: HistTrainState) -> HistTrainState:
                new = 256 + ts.n_merges
                scal = jnp.stack([a, b, new, unk_id]).astype(jnp.int32)
                t2, dl, dr, _ = merge_step(ts.corpus.tw, ts.corpus.wcount,
                                           scal)
                hist = apply_hist_updates(ts.hist, a, b, new,
                                          dl[:, 0], dr[:, 0])
                merges = ts.merges.at[ts.n_merges].set(
                    jnp.stack([a, b]).astype(jnp.int32))
                freqs = ts.merge_freqs.at[ts.n_merges].set(
                    cnt.astype(jnp.int32))
                return HistTrainState(
                    HistCorpus(t2, ts.corpus.wcount), hist, merges, freqs,
                    ts.n_merges + 1, jnp.bool_(False))

            ts = jax.lax.cond(
                cnt == 0,
                lambda s: s._replace(done=jnp.bool_(True)),
                do_merge,
                ts)
            return ts, steps + 1

        ts, _ = jax.lax.while_loop(cond_fn, body_fn, (ts, jnp.int32(0)))
        return ts

    return train_loop


def make_train_loop_sparse(v: int, L: int, W: int, *, target_merges: int,
                           max_steps: int, interpret: bool = False):
    merge_step = make_merge_step_sparse(v, L, W, interpret=interpret)

    @jax.jit
    def train_loop(tw, wcount, presence, hist, merges, freqs, n_merges,
                   done, unk_id, min_pair_freq):
        def cond_fn(carry):
            tw, presence, hist, merges, freqs, n_merges, done, steps = carry
            return ((~done) & (n_merges < target_merges)
                    & (steps < max_steps))

        def body_fn(carry):
            tw, presence, hist, merges, freqs, n_merges, done, steps = carry
            flat = hist.reshape(-1)
            masked = jnp.where(flat >= min_pair_freq, flat, 0)
            best = jnp.argmax(masked)
            cnt = masked[best]
            a = (best // v).astype(jnp.int32)
            b = (best % v).astype(jnp.int32)

            def do_merge(args):
                tw, presence, hist, merges, freqs, n_merges = args
                new = 256 + n_merges
                scal = jnp.stack([a, b, new, unk_id]).astype(jnp.int32)
                flags = presence[:, 0, a] * presence[:, 0, b]
                t2, pres2, dl, dr, _ = merge_step(tw, wcount, presence,
                                                  flags, scal)
                hist = apply_hist_updates(hist, a, b, new,
                                          dl[:, 0], dr[:, 0])
                merges = merges.at[n_merges].set(
                    jnp.stack([a, b]).astype(jnp.int32))
                freqs = freqs.at[n_merges].set(cnt.astype(jnp.int32))
                return (t2, pres2, hist, merges, freqs, n_merges + 1,
                        jnp.bool_(False))

            tw, presence, hist, merges, freqs, n_merges, done = \
                jax.lax.cond(
                    cnt == 0,
                    lambda args: (*args, jnp.bool_(True)),
                    do_merge,
                    (tw, presence, hist, merges, freqs, n_merges))
            return (tw, presence, hist, merges, freqs, n_merges, done,
                    steps + 1)

        out = jax.lax.while_loop(
            cond_fn, body_fn,
            (tw, presence, hist, merges, freqs, n_merges, done,
             jnp.int32(0)))
        return out[:-1]

    return train_loop


def hist_train(tokens: np.ndarray, word_id: np.ndarray, wcount: np.ndarray,
               *, target_merges: int, unk_id: int = -1,
               min_pair_freq: int = 2, max_word_len: int = 64,
               max_steps_per_call: int | None = None,
               interpret: bool = False,
               sparse: bool = False, progress_cb=None,
               lazy_final: bool = False, n_prev_merges: int = 0,
               _cache={}):
    # sparse (chunk-skipping, manual DMA) measured SLOWER than the dense
    # double-buffered pipeline at bench scale (1.85s vs 1.14s for 512
    # merges): early merges touch every chunk and the manual copies
    # serialize.  Kept for large-vocab/rare-pair regimes; default dense.
    """Full driver.  Returns (merges[M,2], freqs[M], final flat tokens,
    final word_id) or None if the layout does not fit.

    Checkpoint resume: pass the REPLAYED corpus (previous merges already
    applied by the caller — models/bpe.py does this with the native
    encoder) plus ``n_prev_merges``; new ids continue at
    256 + n_prev_merges and ``target_merges`` counts from zero (total
    including the previous run).  Only new merges are returned."""
    from . import bpe_giant

    # Engine-specific dispatch cadences: the fused VMEM kernel defaults
    # to 512 merges per call, the giant engine amortizes its HBM-table
    # grid over 4096.  An EXPLICIT caller value (checkpoint cadence,
    # fine-grained progress) is honored by both engines verbatim.
    fused_steps = 512 if max_steps_per_call is None else max_steps_per_call
    giant_steps = 4096 if max_steps_per_call is None else max_steps_per_call

    v = 256 + target_merges
    v = -(-v // 128) * 128
    if v > 4096:
        # beyond the [V, V]-table engines: the giant engine (HBM table,
        # lazy row-max pick, chunk-skipped corpus) covers v <= 32768
        return bpe_giant.giant_train(
            tokens, word_id, wcount, target_merges=target_merges,
            unk_id=unk_id, min_pair_freq=min_pair_freq,
            max_word_len=max_word_len,
            steps_per_call=giant_steps,
            interpret=interpret, progress_cb=progress_cb,
            lazy_final=lazy_final, n_prev_merges=n_prev_merges)
    c = build_layout(tokens, word_id, wcount, max_word_len,
                     min_len=16)   # int16 storage: (16, 128) min tile
    if c is None:
        return None
    L, W = c.tw.shape
    ts = None
    if sparse and n_prev_merges == 0:
        ts = _sparse_drive(c, v, unk_id, min_pair_freq, target_merges,
                           fused_steps, interpret, _cache,
                           progress_cb)
    if ts is None:   # sparse drive declined -> still try the fastest path
        # fastest path: the whole merge loop in one kernel, table and
        # corpus resident in VMEM (zero HBM traffic per merge)
        ts = fused_hist_train(
            c, v, target_merges=target_merges, unk_id=unk_id,
            min_pair_freq=min_pair_freq,
            steps_per_call=fused_steps, interpret=interpret,
            progress_cb=progress_cb, n_prev=n_prev_merges, _cache=_cache)
    if ts is None:
        # corpus too large for the VMEM-resident fused kernel: the giant
        # engine streams chunks from HBM and skips by presence — far
        # cheaper than the full-corpus-per-merge while_loop fallback
        out = bpe_giant.giant_train(
            tokens, word_id, wcount, target_merges=target_merges,
            unk_id=unk_id, min_pair_freq=min_pair_freq,
            max_word_len=max_word_len,
            steps_per_call=giant_steps,
            interpret=interpret, progress_cb=progress_cb,
            lazy_final=lazy_final, n_prev_merges=n_prev_merges)
        if out is not None:
            return out
    if ts is None:
        ts = hist_train_init(c, unk_id, max(target_merges, 1), v)
        ts = ts._replace(
            corpus=HistCorpus(ts.corpus.tw.astype(jnp.int16),
                              ts.corpus.wcount),
            n_merges=jnp.int32(n_prev_merges))
        key = (v, L, W, target_merges, fused_steps, interpret)
        if key not in _cache:
            _cache[key] = make_train_loop(
                v, L, W, target_merges=target_merges,
                max_steps=fused_steps, interpret=interpret)
        loop = _cache[key]
        while True:
            n_before = int(ts.n_merges)
            ts = loop(ts, jnp.int32(unk_id), jnp.int32(min_pair_freq))
            n_after = int(ts.n_merges)
            if progress_cb is not None:
                progress_cb(
                    np.asarray(ts.merges)[n_prev_merges:n_after],
                    np.asarray(ts.merge_freqs)[n_prev_merges:n_after])
            if bool(ts.done) or n_after >= target_merges \
                    or n_after == n_before:
                break
        # slots [0, n_prev_merges) were never written (resume seeds the
        # counter, not the array): drop them from the returned state
        ts = ts._replace(
            merges=np.asarray(ts.merges)[n_prev_merges:],
            merge_freqs=np.asarray(ts.merge_freqs)[n_prev_merges:],
            n_merges=np.int32(int(ts.n_merges) - n_prev_merges))
    n = int(ts.n_merges)
    final_tw = ts.corpus.tw   # possibly still on device (fused path)

    def final_fn():
        """Materialize the final merged corpus (one D2H transfer)."""
        tw = np.asarray(final_tw)
        n_real_words = int(word_id[-1]) + 1   # padding columns beyond
        cols = (tw >= 0).T                    # [W, L]
        final_tokens = tw.T[cols]
        final_word_id = np.repeat(np.arange(tw.shape[1], dtype=np.int32),
                                  cols.sum(1))
        keep = final_word_id < n_real_words
        return (final_tokens[keep].astype(np.int32), final_word_id[keep])

    merges = np.asarray(ts.merges)[:n]
    freqs = np.asarray(ts.merge_freqs)[:n]
    if lazy_final:
        return merges, freqs, final_fn
    return (merges, freqs, *final_fn())


def _sparse_drive(c: HistCorpus, v: int, unk_id, min_pair_freq,
                  target_merges: int, max_steps: int, interpret: bool,
                  _cache, progress_cb=None) -> HistTrainState:
    L, W = c.tw.shape
    hist = init_hist(c, jnp.int32(unk_id), v=v)
    tw16 = c.tw.astype(jnp.int16)
    presence = jnp.asarray(build_presence(np.asarray(c.tw), v))
    merges = jnp.zeros((max(target_merges, 1), 2), jnp.int32)
    freqs = jnp.zeros(max(target_merges, 1), jnp.int32)
    n_merges = jnp.int32(0)
    done = jnp.bool_(False)
    key = ("sparse", v, L, W, target_merges, max_steps, interpret)
    if key not in _cache:
        _cache[key] = make_train_loop_sparse(
            v, L, W, target_merges=target_merges, max_steps=max_steps,
            interpret=interpret)
    loop = _cache[key]
    while True:
        n_before = int(n_merges)
        tw16, presence, hist, merges, freqs, n_merges, done = loop(
            tw16, c.wcount, presence, hist, merges, freqs, n_merges,
            done, jnp.int32(unk_id), jnp.int32(min_pair_freq))
        n_after = int(n_merges)
        if progress_cb is not None:
            progress_cb(np.asarray(merges)[:n_after],
                        np.asarray(freqs)[:n_after])
        if bool(done) or n_after >= target_merges or n_after == n_before:
            break
    return HistTrainState(
        HistCorpus(tw16.astype(jnp.int32), c.wcount), hist, merges,
        freqs, n_merges, done)
