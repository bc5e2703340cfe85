"""Deterministic conformance-corpus generators.

Self-contained PRNG (xorshift64*) — no dependence on stdlib `random`
internals — so the corpora are reproducible forever.  The golden outputs in
this directory were produced by running the *reference* trainer
(/root/reference, compiled out-of-tree with its uninitialized
Symbol::deleted bug fixed — see docs/CONFORMANCE.md) on these corpora.
"""

from __future__ import annotations


class XorShift:
    def __init__(self, seed: int = 0x9E3779B97F4A7C15):
        self.s = seed & 0xFFFFFFFFFFFFFFFF
        if self.s == 0:
            self.s = 1

    def next(self) -> int:
        s = self.s
        s ^= (s >> 12) & 0xFFFFFFFFFFFFFFFF
        s ^= (s << 25) & 0xFFFFFFFFFFFFFFFF
        s ^= (s >> 27) & 0xFFFFFFFFFFFFFFFF
        self.s = s
        return (s * 0x2545F4914F6CDD1D) & 0xFFFFFFFFFFFFFFFF

    def below(self, n: int) -> int:
        return self.next() % n

    def frac(self) -> float:
        return self.next() / 2**64


def small_corpus() -> str:
    """Mirrors the shape of the reference's own test fixture
    (test/bpe_test.cpp:31-56): 10 pangram-ish lines + 20 repeats of 3
    high-redundancy lines."""
    lines = [
        "the quick brown fox jumps over the lazy dog",
        "the brown fox is quick and the dog is lazy",
        "quick brown foxes jump over lazy dogs",
        "the the the quick quick brown brown fox fox",
        "jumping foxes are quick brown animals",
        "lazy dogs sleep under the brown tree",
        "the quick fox and the lazy dog are friends",
        "brown and quick describe the fox perfectly",
        "the lazy dog watches the quick brown fox",
        "quick movements by the brown fox surprise the dog",
    ]
    rep = [
        "hello world hello world programming programming",
        "testing testing the the quick quick brown brown",
        "algorithm algorithm implementation implementation",
    ]
    out = list(lines)
    for _ in range(20):
        out.extend(rep)
    return "\n".join(out) + "\n"


_SYLLABLES = [
    "ing", "tion", "the", "er", "an", "re", "on", "at", "en", "ed",
    "es", "al", "ly", "or", "th", "qu", "ck", "st", "ro", "li",
]
_EXTRAS = [
    "héllo", "naïve", "日本語", "🙂", "don't", "co-op", "3.14",
    "1,000", "$5", "C++", "--flag", "…",
]


def zipf_corpus(n_lines: int = 30000, seed: int = 42) -> str:
    """~1 MB zipfian corpus with unicode/punct/tab noise."""
    rng = XorShift(seed * 0x9E3779B97F4A7C15 + 1)
    base = []
    for _ in range(3000):
        n = 1 + rng.below(4)
        parts = []
        for _ in range(n):
            if rng.frac() < 0.6:
                parts.append(_SYLLABLES[rng.below(len(_SYLLABLES))])
            else:
                parts.append("".join(chr(ord("a") + rng.below(26))
                                     for _ in range(1 + rng.below(3))))
        base.append("".join(parts))
    lines = []
    for _ in range(n_lines):
        k = 3 + rng.below(12)
        ws = []
        for _ in range(k):
            # zipf-ish index: pareto via inverse transform
            u = rng.frac()
            idx = min(int((1.0 / max(u, 1e-12)) ** (1.0 / 1.2)) - 1, 2999)
            ws.append(base[idx])
        if rng.frac() < 0.05:
            ws.append(_EXTRAS[rng.below(len(_EXTRAS))])
        sep = "\t" if rng.frac() < 0.02 else " "
        lines.append(sep.join(ws))
    return "\n".join(lines) + "\n"


# (target_vocab_size, unk_id, character_coverage, min_pair_freq) per corpus;
# golden files are named {corpus}_{i}.merges / .model / .vocab
GOLDEN_CONFIGS = {
    "small": [
        (300, -1, 0.995, 2),
        (500, -1, 0.995, 1000),  # BASELINE.json config 1
        (400, 0, 0.9, 3),
    ],
    "zipf": [
        (1000, -1, 0.995, 50),
        (500, 0, 0.9, 10),
        (2000, -1, 0.9995, 2000),
        (300, -1, 0.5, 5),
        (5000, -1, 0.995, 20),
    ],
}


def corpus_text(name: str) -> str:
    if name == "small":
        return small_corpus()
    if name == "zipf":
        return zipf_corpus()
    raise KeyError(name)
