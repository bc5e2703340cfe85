r"""Vectorized GPT-pattern pre-tokenizer (BASELINE config 4).

The reference documents the GPT-style split pattern as data
(base.py:41-56; pretokenize.PATTERN_GPT) and applies it with the host
`regex` module.  This module replaces the backtracking engine with
byte-class arithmetic: analysis of the pattern shows every alternative
is decidable from character-class RUNS with at most two characters of
lookahead, so the whole split is a fixed pipeline of vectorized ops —
the "byte-class DFA" of the north star with the DFA folded into
closed-form run logic.  Pattern alternatives and their closed forms
(all boundaries are MATCH STARTS; a chunk spans start[i]..start[i+1]):

  1. ``'(?i:[sdmt]|ll|ve|re)``  fires at an apostrophe whose suffix
     matches and whose PREVIOUS char is not punct/apostrophe/space
     (those consume the apostrophe first via alts 4/2).
  2. ``[^\r\n\p{L}\p{N}]?+\p{L}+``  a letter run is one chunk; it
     absorbs a single preceding prefix char when that char is a lone
     punct (a length-1 punct run not itself space-prefixed) or any
     space/tab-class whitespace.
  3. ``\p{N}{1,3}``  digit runs split into blocks of 3 anchored at the
     run start (nothing else can consume digits).
  4. `` ?[^\s\p{L}\p{N}]++[\r\n]*``  a punct run is one chunk (the
     possessive ++ forbids splitting), absorbing one preceding space
     and ALL following newline chars.
  5. ``\s*[\r\n]``  a whitespace run is consumed up to its LAST
     newline (greedy \s* backtracks to the final [\r\n]).
  6. ``\s+(?!\S)``  the newline-free remainder: whole at EOF, else all
     but ONE char — the leftover attaches to the next chunk as an
     alt-2/4 prefix or stands alone.
  7. ``\s+``  whatever remains (single whitespace before a non-letter).

Character classes are GROUND TRUTH: every Unicode codepoint is
classified by the `regex` module's own ``\p{L}``/``\p{N}``/``\s`` and
the case-insensitive contraction letters (e.g. U+017F LONG S matches
``(?i:s)``), built once and disk-cached (~1.1 MB int8).  Codepoints
come from the text via a zero-copy utf-32 view, so the hot path is
pure vectorized numpy.  Exactness is enforced by differential tests
against ``pretokenize.regex_split`` on adversarial and fuzzed inputs.
"""

from __future__ import annotations

import os

import numpy as np

# class ids
C_OTHER = 0       # matches [^\s\p{L}\p{N}], not apostrophe
C_SPACE = 1       # ' '
C_WS = 2          # \s except space/\r/\n
C_CR = 3
C_LF = 4
C_DIGIT = 5
C_LETTER = 6      # letters with no contraction role
C_APO = 7         # '
C_S, C_D, C_M, C_T, C_L, C_V, C_R, C_E = 8, 9, 10, 11, 12, 13, 14, 15

_MAX_CP = 0x110000
_TABLE: np.ndarray | None = None


def _cache_path() -> str:
    base = os.environ.get("XDG_CACHE_HOME",
                          os.path.join(os.path.expanduser("~"), ".cache"))
    return os.path.join(base, "shredword_tpu", "gpt_classes_v1.npy")


def _build_table() -> np.ndarray:
    """Classify every codepoint with the regex module itself."""
    import regex as _re
    table = np.zeros(_MAX_CP, np.int8)
    all_cps = "".join(
        chr(c) for c in range(_MAX_CP)
        if not (0xD800 <= c <= 0xDFFF))          # surrogates unencodable
    cps = np.frombuffer(all_cps.encode("utf-32-le"), np.uint32)

    def hits(pattern):
        h = np.zeros(len(cps), bool)
        for m in _re.finditer(pattern, all_cps):
            h[m.start():m.end()] = True
        return h

    table[cps[hits(r"\s")]] = C_WS
    table[cps[hits(r"\p{N}")]] = C_DIGIT
    letter = hits(r"\p{L}")
    table[cps[letter]] = C_LETTER
    for pat, cls in ((r"s", C_S), (r"d", C_D), (r"m", C_M), (r"t", C_T),
                     (r"l", C_L), (r"v", C_V), (r"r", C_R), (r"e", C_E)):
        sel = hits(f"(?i:{pat})") & letter
        table[cps[sel]] = cls
    table[ord(" ")] = C_SPACE
    table[ord("\r")] = C_CR
    table[ord("\n")] = C_LF
    table[ord("'")] = C_APO
    return table


def class_table() -> np.ndarray:
    global _TABLE
    if _TABLE is None:
        path = _cache_path()
        if os.path.exists(path):
            _TABLE = np.load(path)
        else:
            _TABLE = _build_table()
            os.makedirs(os.path.dirname(path), exist_ok=True)
            tmp = path[:-4] + f".tmp{os.getpid()}.npy"
            np.save(tmp, _TABLE)
            os.replace(tmp, path)
    return _TABLE


_LETTERISH = np.zeros(17, bool)
_LETTERISH[[C_LETTER, C_S, C_D, C_M, C_T, C_L, C_V, C_R, C_E]] = True
_WSANY = np.zeros(17, bool)
_WSANY[[C_SPACE, C_WS, C_CR, C_LF]] = True
_SDMT = np.zeros(17, bool)
_SDMT[[C_S, C_D, C_M, C_T]] = True
# class index 16 = out-of-text sentinel (False in every mask)


def _PUNCT(c):
    return (c == C_OTHER) | (c == C_APO)


def gpt_starts(cp: np.ndarray) -> np.ndarray:
    """Match-start indices (char space) for PATTERN_GPT; starts[0] == 0.
    Chunk i spans [starts[i], starts[i+1]) with starts[len] == n."""
    n = len(cp)
    if n == 0:
        return np.zeros(0, np.int64)
    cls = class_table()[cp].astype(np.int8)
    nxt = np.full(n, 16, np.int8)
    nxt[:n - 1] = cls[1:]
    nxt2 = np.full(n, 16, np.int8)
    nxt2[:max(n - 2, 0)] = cls[2:]
    prv = np.full(n, 16, np.int8)
    prv[1:] = cls[:-1]

    letter = _LETTERISH[cls]
    wsany = _WSANY[cls]
    nl = (cls == C_CR) | (cls == C_LF)
    punct = (cls == C_OTHER) | (cls == C_APO)
    space = cls == C_SPACE
    tabish = cls == C_WS
    digit = cls == C_DIGIT
    letter_n = _LETTERISH[nxt]
    punct_p = _PUNCT(prv)
    idx = np.arange(n, dtype=np.int64)
    # start is over-allocated so every "mark position p+s for mask at p"
    # is a shifted boolean-mask assignment (one pass, no fancy-index
    # compaction — measured 5x faster at corpus scale)
    start = np.zeros(n + 3, bool)

    def mark(mask, shift=0):
        start[shift:shift + n][mask] = True

    # ---- alt 1: contractions (previous char must not consume the ')
    apo = cls == C_APO
    blocked = punct_p | (prv == C_SPACE)
    con1 = apo & ~blocked & _SDMT[nxt]
    con2 = (apo & ~blocked & ~con1
            & (((nxt == C_L) & (nxt2 == C_L))
               | ((nxt == C_V) & (nxt2 == C_E))
               | ((nxt == C_R) & (nxt2 == C_E))))
    mark(con1)
    mark(con1, 2)                      # next chunk resumes after suffix
    mark(con2)
    mark(con2, 3)
    consumed = np.zeros(n + 2, bool)   # letters eaten by a contraction
    consumed[1:1 + n][con1] = True
    consumed[1:1 + n][con2] = True
    consumed[2:2 + n][con2] = True
    consumed = consumed[:n]
    con = con1 | con2

    # ---- alt 2: letter-run chunks with optional absorbed prefix
    consumed_p = np.zeros(n, bool)
    consumed_p[1:] = consumed[:-1]
    letter_p = _LETTERISH[prv]
    head = letter & ~consumed & (~letter_p | consumed_p)
    # prefix candidates at head-1:
    #   lone punct (length-1 punct run), itself not space-prefixed and
    #   not a contraction apostrophe; or any space/tab-class ws char
    punct_pp = np.full(n, 16, np.int8)             # class at p-2
    punct_pp[1:] = prv[:-1]
    con_p = np.zeros(n, bool)
    con_p[1:] = con[:-1]
    lone_punct_p = (punct_p & ~_PUNCT(punct_pp)
                    & (punct_pp != C_SPACE) & ~con_p)
    ws_prefix_p = (prv == C_SPACE) | (prv == C_WS)
    absorb = head & (lone_punct_p | ws_prefix_p)
    absorb[0] = False
    mark(head & ~absorb)
    if n > 1:
        start[: n - 1][absorb[1:]] = True          # mark position p-1

    # ---- alt 3: digit blocks of 3 anchored at run starts
    if digit.any():
        drs = digit.copy()
        drs[1:] &= ~digit[:-1]
        d_id = np.cumsum(drs) - 1
        d_start = idx[drs]
        off = idx[digit] - d_start[d_id[digit]]
        blk = np.zeros(n, bool)
        blk[idx[digit][off % 3 == 0]] = True
        mark(blk)
        dre = digit.copy()
        dre[:-1] &= ~digit[1:]
        mark(dre, 1)                   # position after each digit run

    # ---- alt 4: punct-run chunks (+space prefix; newline suffix below)
    prs = punct & ~punct_p & ~con
    sp_absorb = prs & (prv == C_SPACE)
    sp_absorb[0] = False
    # a lone punct followed by a letter was absorbed as alt-2 prefix
    lone = punct & ~punct_p & ~_PUNCT(nxt)
    eaten = lone & letter_n & ~con & ~(prv == C_SPACE)
    mark(prs & ~sp_absorb & ~eaten)
    if n > 1:
        start[: n - 1][sp_absorb[1:]] = True

    # ---- alts 5/6/7: whitespace runs
    if wsany.any():
        wrs = wsany & ~np.concatenate([[False], wsany[:-1]])
        wre = wsany & ~np.concatenate([wsany[1:], [False]])
        a = idx[wrs]
        b = idx[wre] + 1
        # per-run last-newline / first-non-newline via searchsorted over
        # the sorted nl / non-nl-ws index lists (ufunc.at is too slow)
        nl_idx = idx[nl]
        if len(nl_idx):
            pos = np.searchsorted(nl_idx, b) - 1
            got = nl_idx[np.maximum(pos, 0)]
            lastnl = np.where((pos >= 0) & (got >= a), got, -1)
        else:
            lastnl = np.full(len(a), -1, np.int64)
        nonnl_idx = idx[wsany & ~nl]
        if len(nonnl_idx):
            pos2 = np.minimum(np.searchsorted(nonnl_idx, a),
                              len(nonnl_idx) - 1)
            got2 = nonnl_idx[pos2]
            first_nonnl = np.where((got2 >= a) & (got2 < b), got2,
                                   np.iinfo(np.int64).max)
        else:
            first_nonnl = np.full(len(a), np.iinfo(np.int64).max)
        lead = np.minimum(first_nonnl, b) - a      # nl-prefix length
        absorb_nl = (a > 0) & punct[np.maximum(a - 1, 0)] & nl[a]
        p0 = np.where(absorb_nl, a + lead, a)
        start[p0[p0 < b]] = True
        rem = np.maximum(p0, np.where(lastnl >= p0, lastnl + 1, p0))
        mark_nl = (lastnl >= p0) & (lastnl + 1 < b)
        start[(lastnl + 1)[mark_nl]] = True
        leftover = (b < n) & (b - rem >= 2)
        start[(b - 1)[leftover]] = True

    start[0] = True
    return np.nonzero(start[:n])[0].astype(np.int64)


def gpt_split_str(text: str) -> list[str]:
    """PATTERN_GPT chunks via the vectorized splitter (host path)."""
    if not text:
        return []
    cp = np.frombuffer(text.encode("utf-32-le"), np.uint32)
    starts = gpt_starts(cp)
    bounds = np.concatenate([starts, [len(cp)]])
    return [text[bounds[i]:bounds[i + 1]] for i in range(len(starts))]


def gpt_chunk_lens_bytes(data: bytes) -> np.ndarray:
    """Chunk byte-lengths of PATTERN_GPT over utf-8 bytes (for the
    device encoder: pairs with the raw byte stream, no str slicing)."""
    if not data:
        return np.zeros(0, np.int64)
    text = data.decode("utf-8")
    cp = np.frombuffer(text.encode("utf-32-le"), np.uint32)
    starts = gpt_starts(cp)
    blen = np.where(cp < 0x80, 1,
                    np.where(cp < 0x800, 2, np.where(cp < 0x10000, 3, 4)))
    byte_off = np.zeros(len(cp) + 1, np.int64)
    np.cumsum(blen, out=byte_off[1:])
    bounds = byte_off[np.concatenate([starts, [len(cp)]])]
    return np.diff(bounds)
