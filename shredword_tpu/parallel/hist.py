"""Sharded histogram-engine training: the fused Pallas merge kernel on
data-parallel word shards with psum-reduced count deltas.

Layout: the by-word matrix [L, W] shards along the word axis over the
`data` mesh axis (words never span shards — no halo exchange).  Every
merge step:

  1. LOCAL  : fused kernel pass on this shard (match + select +
              compact + slot-collapse delta histograms) -> dl, dr
              int32[V]
  2. REDUCE : ``psum`` of the two delta vectors over ICI (integer —
              bit-deterministic regardless of shard order)
  3. APPLY  : replicated hist row/col updates + argmax — identical on
              every chip, so the chosen pair needs no broadcast

The pair table is replicated (V^2 int32, a few MB); only 2·V int32 of
deltas cross the interconnect per merge — far less than the gathered
pair segments of the flat sharded path (train.py).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..ops import bpe_hist
from . import train


class ShardedHistState(NamedTuple):
    tw: jax.Array           # int32[L, W]  (sharded on axis 1)
    wcount: jax.Array       # int32[1, W]  (sharded on axis 1)
    hist: jax.Array         # int32[V, V]  (replicated)
    merges: jax.Array       # int32[M_max, 2]
    merge_freqs: jax.Array  # int32[M_max]
    n_merges: jax.Array     # int32
    done: jax.Array         # bool


def shard_layout(tokens: np.ndarray, word_id: np.ndarray,
                 wcount: np.ndarray, n_shards: int,
                 max_word_len: int = 64):
    """Build the [L, W] layout with W a multiple of n_shards * CHUNK
    (pad columns carry weight 0)."""
    c = bpe_hist.build_layout(tokens, word_id, wcount, max_word_len,
                              min_len=16)  # int16 tile floor
    if c is None:
        return None
    L, W = c.tw.shape
    unit = n_shards * bpe_hist.CHUNK
    W2 = -(-W // unit) * unit
    if W2 != W:
        tw = np.full((L, W2), bpe_hist.PAD, np.int16)
        tw[:, :W] = np.asarray(c.tw)
        wc = np.zeros((1, W2), np.int32)
        wc[:, :W] = np.asarray(c.wcount)
        c = bpe_hist.HistCorpus(jnp.asarray(tw), jnp.asarray(wc))
    return c


def build_sharded_hist_loop(mesh: Mesh, v: int, L: int, W: int, *,
                            target_merges: int, max_steps: int,
                            axis: str = "data", interpret: bool = False):
    n_shards = mesh.devices.size
    merge_step = bpe_hist.make_merge_step(v, L, W // n_shards,
                                          interpret=interpret)

    def shard_body(tw, wc, hist, merges, freqs, n_merges, done,
                   unk_id, min_pair_freq):
        def cond_fn(carry):
            tw, hist, merges, freqs, n_merges, done, steps = carry
            return ((~done) & (n_merges < target_merges)
                    & (steps < max_steps))

        def body_fn(carry):
            tw, hist, merges, freqs, n_merges, done, steps = carry
            flat = hist.reshape(-1)
            masked = jnp.where(flat >= min_pair_freq, flat, 0)
            best = jnp.argmax(masked)
            cnt = masked[best]
            a = (best // v).astype(jnp.int32)
            b = (best % v).astype(jnp.int32)

            def do_merge(args):
                tw, hist, merges, freqs, n_merges = args
                new = 256 + n_merges
                scal = jnp.stack([a, b, new, unk_id]).astype(jnp.int32)
                t2, dl, dr, _ = merge_step(tw, wc, scal)
                dl = jax.lax.psum(dl[:, 0], axis)
                dr = jax.lax.psum(dr[:, 0], axis)
                hist = bpe_hist.apply_hist_updates(hist, a, b, new, dl, dr)
                merges = merges.at[n_merges].set(
                    jnp.stack([a, b]).astype(jnp.int32))
                freqs = freqs.at[n_merges].set(cnt.astype(jnp.int32))
                return t2, hist, merges, freqs, n_merges + 1, \
                    jnp.bool_(False)

            tw, hist, merges, freqs, n_merges, done = jax.lax.cond(
                cnt == 0,
                lambda args: (*args, jnp.bool_(True)),
                do_merge,
                (tw, hist, merges, freqs, n_merges))
            return tw, hist, merges, freqs, n_merges, done, steps + 1

        tw, hist, merges, freqs, n_merges, done, _ = jax.lax.while_loop(
            cond_fn, body_fn,
            (tw, hist, merges, freqs, n_merges, done, jnp.int32(0)))
        return tw, hist, merges, freqs, n_merges, done

    col = P(None, axis)
    repl = P()
    fn = shard_map(
        shard_body, mesh=mesh,
        in_specs=(col, col, repl, repl, repl, repl, repl, repl, repl),
        out_specs=(col, repl, repl, repl, repl, repl),
        check_vma=False,
    )
    return jax.jit(fn)


def sharded_hist_train(tokens: np.ndarray, word_id: np.ndarray,
                       wcount: np.ndarray, *, mesh: Mesh,
                       target_merges: int, unk_id: int = -1,
                       min_pair_freq: int = 2,
                       max_steps_per_call: int = 512,
                       axis: str = "data", interpret: bool = False,
                       n_prev_merges: int = 0, _cache={}):
    """Sharded driver.  wcount is per word.  Returns (merges, freqs)
    or None if the layout does not fit.

    Checkpoint resume: the caller replays the first ``n_prev_merges``
    merges into ``tokens`` host-side; the loop's merge counter seeds at
    n_prev so new ids continue at 256 + n_prev (the loop derives
    new = 256 + n_merges).  Only NEW merges are returned."""
    # Same per-shard envelope as the single-device while_loop engine
    # (make_merge_step blocks are [L, CHUNK] + dl/dr columns in VMEM —
    # v-independent except the [v, 1] delta columns): v <= 4096, beyond
    # which the row-sharded giant table takes over (parallel/giant.py).
    v = -(-(256 + target_merges) // 128) * 128
    if v > 4096:
        return None
    n_shards = mesh.devices.size
    c = shard_layout(tokens, word_id, wcount, n_shards)
    if c is None:
        return None
    L, W = c.tw.shape
    hist = bpe_hist.init_hist(c, jnp.int32(unk_id), v=v)
    st = ShardedHistState(
        tw=c.tw.astype(jnp.int16), wcount=c.wcount, hist=hist,
        merges=jnp.zeros((max(target_merges, 1), 2), jnp.int32),
        merge_freqs=jnp.zeros(max(target_merges, 1), jnp.int32),
        n_merges=jnp.int32(n_prev_merges), done=jnp.bool_(False))
    key = (train.mesh_key(mesh), v, L, W, target_merges,
           max_steps_per_call, axis, interpret)
    if key not in _cache:
        _cache[key] = build_sharded_hist_loop(
            mesh, v, L, W, target_merges=target_merges,
            max_steps=max_steps_per_call, axis=axis, interpret=interpret)
    loop = _cache[key]
    tw, wc, hist, merges, freqs, n_merges, done = (
        st.tw, st.wcount, st.hist, st.merges, st.merge_freqs,
        st.n_merges, st.done)
    while True:
        n_before = int(n_merges)
        tw, hist, merges, freqs, n_merges, done = loop(
            tw, wc, hist, merges, freqs, n_merges, done,
            jnp.int32(unk_id), jnp.int32(min_pair_freq))
        n_after = int(n_merges)
        if bool(done) or n_after >= target_merges or n_after == n_before:
            break
    n = int(n_merges)
    return (np.asarray(merges)[n_prev_merges:n],
            np.asarray(freqs)[n_prev_merges:n])
