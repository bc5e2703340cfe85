"""UnigramTrainer — SentencePiece-style unigram LM trainer, TPU-native.

The reference ships only the dormant groundwork for this trainer — the
normalizer and the seed-vocabulary substring enumerator
(normalize.cpp:24-59, 215-237; SURVEY.md §2.A "Normalizer + subword
enumerator (DORMANT)") — while its package description promises "BPE &
Unigram trainers" (pyproject.toml:8).  This module supplies the full
trainer the reference never wired up:

  1. normalize + whitespace-split to unique words with counts, each
     word prefixed with the U+2581 marker (SentencePiece convention)
  2. seed vocabulary = all substrings (reference enumerator semantics)
     capped to `seed_size` by count
  3. EM: the E-step runs as a batched lattice forward-backward on
     device — words padded to [n_words, L], piece lookups precomputed
     host-side into an int32 [n_words, L, K] table (runtime
     shred_piece_table), the DP scanned over positions with
     ``lax.scan`` and reduced with logsumexp; expected counts
     aggregated per piece
  4. pruning: drop the lowest-likelihood-contribution pieces per round
     (keeping all single bytes) until the target size is reached
  5. Viterbi segmentation for encoding (same lattice, max instead of
     logsumexp)

Counts/probabilities are float32 on device; piece scores are kept in
log space throughout.
"""

from __future__ import annotations

import math

import numpy as np

from ..config import UnigramConfig
from ..errors import EncodeError, TrainingError
from ..runtime import native
from ..utils import logging as log

_MARKER = "▁".encode()


def _prep_words(corpus_bytes: bytes, max_word_len: int):
    """Normalize, split at markers, dedup to (words, counts)."""
    norm = native.normalize(corpus_bytes)
    counts: dict[bytes, int] = {}
    for line in norm.split(b"\n"):
        for raw in line.split(_MARKER):
            if not raw:
                continue
            w = (_MARKER + raw)[: max_word_len]
            counts[w] = counts.get(w, 0) + 1
    words = sorted(counts)
    return words, np.asarray([counts[w] for w in words], dtype=np.int64)


class UnigramTrainer:
    """API mirrors BPETrainer: load_corpus / train / save."""

    def __init__(self, target_vocab_size: int = 8192,
                 seed_size: int = 100_000, max_piece_len: int = 15,
                 max_word_len: int = 32, shrink_factor: float = 0.75,
                 num_em_rounds: int = 2, backend: str = "tpu", **kw):
        self.config = UnigramConfig(
            target_vocab_size=target_vocab_size, seed_size=seed_size,
            max_piece_len=max_piece_len, max_word_len=max_word_len,
            shrink_factor=shrink_factor, num_em_rounds=num_em_rounds,
            backend=backend, **kw).validate()
        self._words: list[bytes] | None = None
        self._wcounts: np.ndarray | None = None
        self.pieces: list[bytes] = []
        self.log_probs: np.ndarray = np.zeros(0, np.float64)

    # ------------------------------------------------------------------

    def load_corpus(self, path: str) -> None:
        with open(path, "rb") as f:
            data = f.read()
        self._words, self._wcounts = _prep_words(
            data, self.config.max_word_len)
        log.info("Unigram corpus: %d unique words, %d occurrences",
                 len(self._words), int(self._wcounts.sum()))

    # ------------------------------------------------------------------

    def _seed(self) -> tuple[list[bytes], np.ndarray]:
        sv = native.SeedVocab()
        try:
            for w, c in zip(self._words, self._wcounts):
                # skip_markers=False: word-boundary pieces (marker-
                # prefixed) must be seedable for the trainer, unlike the
                # reference-parity enumerator surface
                sv.add(w, max_len=self.config.max_piece_len,
                       weight=int(c), skip_markers=False)
            pieces, counts = sv.export(self.config.seed_size)
        finally:
            sv.free()
        # required single bytes: every byte occurring in any word
        seen = set()
        for w in self._words:
            seen.update(w)
        singles = [bytes([b]) for b in sorted(seen)]
        have = set(pieces)
        extra = [s for s in singles if s not in have]
        if extra:
            pieces = pieces + extra
            counts = np.concatenate(
                [counts, np.ones(len(extra), np.int64)])
        return pieces, counts

    def _required(self, pieces: list[bytes]) -> np.ndarray:
        """Mask of pieces that may never be pruned (single bytes)."""
        return np.asarray([len(p) == 1 for p in pieces])

    # ------------------------------------------------------------------

    def _e_step(self, pieces, logp, table=None):
        """Expected piece counts + total log likelihood (device DP).
        `table` may be precomputed (pieces unchanged between EM rounds —
        only logp varies)."""
        from ..ops import unigram_ops
        L = self.config.max_word_len
        K = self.config.max_piece_len
        if table is None:
            table = native.piece_table(self._words, pieces, L, K)
        wlen = np.asarray([len(w) for w in self._words], np.int32)
        exp_counts, ll = unigram_ops.forward_backward(
            table, wlen, self._wcounts.astype(np.float32),
            np.asarray(logp, np.float32), len(pieces),
            backend=self.config.backend)
        return np.asarray(exp_counts, np.float64), float(ll)

    def train(self) -> int:
        if self._words is None:
            raise TrainingError("load_corpus must be called before train")
        cfg = self.config
        pieces, counts = self._seed()
        freq = counts.astype(np.float64)
        logp = np.log(freq / freq.sum())
        log.info("Unigram seed: %d pieces", len(pieces))

        while True:
            table = native.piece_table(self._words, pieces,
                                       cfg.max_word_len,
                                       cfg.max_piece_len)
            for r in range(cfg.num_em_rounds):
                exp_counts, ll = self._e_step(pieces, logp, table=table)
                tot = exp_counts.sum()
                with np.errstate(divide="ignore"):
                    logp = np.where(exp_counts > 0,
                                    np.log(exp_counts / max(tot, 1e-300)),
                                    -1e30)
                log.progress("EM round %d: %d pieces, loss %.4f", r,
                             len(pieces), -ll)
            if len(pieces) <= cfg.target_vocab_size:
                break
            # prune: drop lowest-contribution prunable pieces
            required = self._required(pieces)
            contribution = exp_counts * np.where(logp > -1e29, logp, 0)
            # less negative contribution == less important
            order = np.argsort(-contribution)  # most negative last
            keep_n = max(cfg.target_vocab_size,
                         int(len(pieces) * cfg.shrink_factor))
            keep = required.copy()
            slots = keep_n - int(required.sum())
            for idx in order[::-1]:  # most important first
                if slots <= 0:
                    break
                if not keep[idx]:
                    keep[idx] = True
                    slots -= 1
            new_pieces = [p for p, k in zip(pieces, keep) if k]
            if len(new_pieces) == len(pieces):
                log.warning(
                    "unigram prune cannot shrink below %d required "
                    "pieces (target %d); stopping", int(required.sum()),
                    cfg.target_vocab_size)
                pieces = new_pieces
                logp = logp[keep]
                break
            pieces = new_pieces
            logp = logp[keep]
            logp -= np.log(np.exp(logp).sum() + 1e-300)
        self.pieces = pieces
        self.log_probs = logp
        log.info("Unigram training complete: %d pieces", len(pieces))
        return len(pieces)

    # ------------------------------------------------------------------

    def save(self, model_path: str) -> None:
        """Text format: 'shredword unigram v1' + piece-hex<TAB>logprob."""
        with open(model_path, "w", encoding="utf-8") as f:
            f.write("shredword unigram v1\n")
            f.write(f"{len(self.pieces)}\n")
            for p, lp in zip(self.pieces, self.log_probs):
                f.write(f"{p.hex()}\t{lp:.17g}\n")

    @classmethod
    def load_model(cls, model_path: str) -> tuple[list[bytes], np.ndarray]:
        with open(model_path, "r", encoding="utf-8") as f:
            header = f.readline().strip()
            if header != "shredword unigram v1":
                raise TrainingError(f"bad unigram model header: {header!r}")
            n = int(f.readline())
            pieces, lps = [], []
            for _ in range(n):
                hx, lp = f.readline().split("\t")
                pieces.append(bytes.fromhex(hx))
                lps.append(float(lp))
        return pieces, np.asarray(lps, np.float64)


class UnigramTokenizer:
    """Viterbi segmentation with a trained unigram model."""

    def __init__(self, pieces: list[bytes], log_probs: np.ndarray):
        self.pieces = pieces
        self.log_probs = np.asarray(log_probs, np.float64)
        self._index = {p: i for i, p in enumerate(pieces)}
        self._max_len = max((len(p) for p in pieces), default=1)

    @classmethod
    def load(cls, model_path: str) -> "UnigramTokenizer":
        return cls(*UnigramTrainer.load_model(model_path))

    def encode_word(self, word: bytes) -> list[int]:
        n = len(word)
        best = np.full(n + 1, -math.inf)
        best[0] = 0.0
        back: list[tuple[int, int]] = [(-1, -1)] * (n + 1)
        for j in range(1, n + 1):
            for l in range(1, min(self._max_len, j) + 1):
                pid = self._index.get(word[j - l:j])
                if pid is None:
                    continue
                cand = best[j - l] + self.log_probs[pid]
                if cand > best[j]:
                    best[j] = cand
                    back[j] = (j - l, pid)
        if not math.isfinite(best[n]):
            raise EncodeError(
                f"word {word!r} cannot be segmented: it contains bytes "
                "absent from the training corpus")
        ids = []
        j = n
        while j > 0:
            j, pid = back[j]
            ids.append(pid)
        return ids[::-1]

    def encode(self, text: str) -> list[int]:
        norm = native.normalize(text.encode())
        out: list[int] = []
        for line in norm.split(b"\n"):
            for raw in line.split(_MARKER):
                if raw:
                    out.extend(self.encode_word(_MARKER + raw))
        return out

    def decode(self, ids) -> str:
        data = b"".join(self.pieces[i] for i in ids)
        return data.replace(_MARKER, b" ").decode("utf-8", "replace").strip()
