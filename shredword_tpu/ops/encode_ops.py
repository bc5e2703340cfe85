"""TPU batch encoder — minbpe-contract BPE encoding over flat arrays.

Semantics (the contract implied by the reference's merges table + merge()
left-to-right overlap rule, base.py:22-36, never implemented there):
per chunk, repeatedly substitute the *lowest-rank* adjacent pair present,
consuming overlapping runs greedily left-to-right, until no adjacent pair
is a known merge.

TPU-native formulation: all chunks are concatenated into one flat int32
stream with a chunk-id array.  Each device round:

  1. rank[i]  = hash-probe lookup of pair (t[i], t[i+1]) in a replicated
     open-addressing table (vectorized gathers — no host round trip)
  2. cmin[c]  = segment-min of ranks per chunk
  3. positions whose rank equals their chunk's min merge simultaneously
     (one rank per chunk per round — exactly per-chunk sequential order,
     but thousands of chunks advance in parallel)
  4. parity scan resolves overlapping runs; masked scatter compacts

The whole loop runs inside ``lax.while_loop`` in one XLA dispatch.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

RANK_INF = jnp.iinfo(jnp.int32).max


def _np_mix(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    # uint32 wraparound is the point of the mix; silence the warnings
    with np.errstate(over="ignore"):
        h = (a.astype(np.uint32) * np.uint32(0x9E3779B1)
             + b.astype(np.uint32) * np.uint32(0x85EBCA6B))
        h ^= h >> np.uint32(16)
        h *= np.uint32(0x045D9F3B)
        h ^= h >> np.uint32(16)
    return h


def _jnp_mix(a: jax.Array, b: jax.Array) -> jax.Array:
    h = (a.astype(jnp.uint32) * jnp.uint32(0x9E3779B1)
         + b.astype(jnp.uint32) * jnp.uint32(0x85EBCA6B))
    h ^= h >> jnp.uint32(16)
    h *= jnp.uint32(0x045D9F3B)
    h ^= h >> jnp.uint32(16)
    return h


class MergeTable(NamedTuple):
    """Replicated open-addressing pair->rank table (device arrays)."""

    ka: jax.Array     # int32[C] first id  (-1 = empty)
    kb: jax.Array     # int32[C] second id
    rank: jax.Array   # int32[C] merge rank (-1 = empty)
    max_probe: int    # static probe bound

    @property
    def capacity(self) -> int:
        return self.ka.shape[0]


def build_merge_table(merges: np.ndarray) -> MergeTable:
    """Host-side construction; first occurrence of a pair wins (earliest
    rank), matching the reference trainer's dense-id invariant."""
    merges = np.asarray(merges, dtype=np.int32).reshape(-1, 2)
    n = len(merges)
    cap = 64
    while cap < 2 * n + 2:
        cap *= 2
    ka = np.full(cap, -1, np.int32)
    kb = np.full(cap, -1, np.int32)
    rk = np.full(cap, -1, np.int32)
    mask = cap - 1
    max_probe = 1
    for m in range(n):
        a, b = int(merges[m, 0]), int(merges[m, 1])
        slot = int(_np_mix(np.int32(a), np.int32(b))) & mask
        probes = 1
        while rk[slot] != -1:
            if ka[slot] == a and kb[slot] == b:
                break  # duplicate pair: keep earliest rank
            slot = (slot + 1) & mask
            probes += 1
        if rk[slot] == -1:
            ka[slot], kb[slot], rk[slot] = a, b, m
            max_probe = max(max_probe, probes)
    return MergeTable(jnp.asarray(ka), jnp.asarray(kb), jnp.asarray(rk),
                      max_probe)


def lookup_ranks(table: MergeTable, a: jax.Array, b: jax.Array,
                 valid: jax.Array) -> jax.Array:
    """Vectorized pair->rank lookup; RANK_INF where absent/invalid."""
    cap = table.capacity
    mask = jnp.uint32(cap - 1)
    h = (_jnp_mix(a, b) & mask).astype(jnp.int32)

    def probe(k, carry):
        rank, done = carry
        slot = (h + k) & (cap - 1)
        ta = table.ka[slot]
        tb = table.kb[slot]
        tr = table.rank[slot]
        hit = (ta == a) & (tb == b)
        empty = tr < 0
        rank = jnp.where(hit & ~done, tr, rank)
        done = done | hit | empty
        return rank, done

    rank = jnp.full(a.shape, RANK_INF, jnp.int32)
    done = jnp.zeros(a.shape, jnp.bool_)
    rank, _ = jax.lax.fori_loop(0, table.max_probe, probe, (rank, done))
    return jnp.where(valid & (rank >= 0) & (rank < RANK_INF), rank, RANK_INF)


class EncodeState(NamedTuple):
    tokens: jax.Array    # int32[N]
    chunk_id: jax.Array  # int32[N], -1 padding
    length: jax.Array    # int32


@partial(jax.jit, static_argnames=("num_chunks",))
def encode_flat(tokens: jax.Array, chunk_id: jax.Array, length: jax.Array,
                table: MergeTable, *, num_chunks: int) -> EncodeState:
    """Encode the flat stream fully on device.  Shapes are static; the
    result's live prefix is ``length``."""
    n = tokens.shape[0]
    idx = jnp.arange(n, dtype=jnp.int32)
    state = EncodeState(tokens, chunk_id, length)

    def pair_ranks(st: EncodeState):
        t = st.tokens
        nxt = jnp.roll(t, -1)
        w = st.chunk_id
        valid = (idx < st.length - 1) & (w == jnp.roll(w, -1)) & (w >= 0)
        return lookup_ranks(table, t, nxt, valid), nxt

    def cond_fn(st: EncodeState):
        r, _ = pair_ranks(st)
        return jnp.any(r < RANK_INF)

    def body_fn(st: EncodeState):
        r, nxt = pair_ranks(st)
        w = st.chunk_id
        seg = jnp.where(w >= 0, w, 0)
        cmin = jax.ops.segment_min(r, seg, num_segments=num_chunks)
        match = (r < RANK_INF) & (r == cmin[seg]) & (w >= 0)
        # parity scan: greedy left-to-right within runs of matches
        nm = jnp.where(match, -1, idx)
        last_nm = jax.lax.associative_scan(jnp.maximum, nm)
        sel = match & ((idx - last_nm - 1) % 2 == 0)

        t = jnp.where(sel, 256 + r, st.tokens)
        killed = jnp.roll(sel, 1).at[0].set(False)
        keep = (~killed) & (idx < st.length)
        pos = jnp.cumsum(keep.astype(jnp.int32)) - 1
        dest = jnp.where(keep, pos, n)
        tokens = jnp.zeros(n, jnp.int32).at[dest].set(t, mode="drop")
        chunk = jnp.full(n, -1, jnp.int32).at[dest].set(w, mode="drop")
        return EncodeState(tokens, chunk, jnp.sum(keep.astype(jnp.int32)))

    return jax.lax.while_loop(cond_fn, body_fn, state)


def encode_chunks(chunks: list[bytes], table: MergeTable,
                  capacity: int | None = None) -> np.ndarray:
    """Host convenience: encode a list of byte chunks, return flat ids."""
    if not chunks:
        return np.zeros(0, np.int32)
    lens = np.fromiter((len(c) for c in chunks), np.int64, len(chunks))
    total = int(lens.sum())
    cap = capacity or max(1024, 1 << int(np.ceil(np.log2(max(total, 2)))))
    flat = np.frombuffer(b"".join(chunks), np.uint8).astype(np.int32)
    cid = np.repeat(np.arange(len(chunks), dtype=np.int32), lens)
    tokens = np.zeros(cap, np.int32)
    tokens[:total] = flat
    chunk_id = np.full(cap, -1, np.int32)
    chunk_id[:total] = cid
    st = encode_flat(jnp.asarray(tokens), jnp.asarray(chunk_id),
                     jnp.int32(total), table, num_chunks=len(chunks))
    return np.asarray(st.tokens)[: int(st.length)]
