"""Text-analysis primitives for the documents pipelines.

Deterministic, seed-free (all hashing via md5/blake2b/sha256 — stable across
processes, the same property that makes minted URIs retry-safe, M7).
word_hash64 is md5-based specifically so the DuckDB oracles can replicate it
(``('0x' || substr(md5(w), 1, 16))::UBIGINT``), which upgrades the MinHash /
SimHash queries from rows-only to exact-oracle parity.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np

TOKEN_RE = re.compile(r"[a-z]+")

STOP_EN = ("the", "a", "of", "and", "to", "in", "is", "on", "for", "with")
STOP_DE = ("der", "die", "das", "und", "ist", "ein", "nicht", "mit")
STOP_FR = ("le", "la", "et", "les", "des", "un", "une", "est")


def tokens_lower(text: str) -> list[str]:
    return TOKEN_RE.findall(text.lower())


def word_hash64(word: str) -> int:
    """Stable 64-bit word hash: big-endian first 8 bytes of md5 (SQL twin:
    ``('0x' || substr(md5(w), 1, 16))::UBIGINT``)."""
    return int.from_bytes(hashlib.md5(word.encode()).digest()[:8], "big")


def shingle_hashes(toks: list[str], k: int = 3) -> np.ndarray:
    """Distinct k-word shingle hashes (the MinHash universe)."""
    if len(toks) < k:
        return np.array([], dtype=np.uint64)
    out = {word_hash64(" ".join(toks[i:i + k])) for i in range(len(toks) - k + 1)}
    return np.fromiter(out, dtype=np.uint64, count=len(out))


_MERSENNE31 = (1 << 31) - 1  # fits a*x in uint64 → fully vectorized mod-hash


def minhash_params(k: int = 64, seed: int = 7) -> tuple[np.ndarray, np.ndarray]:
    """Fixed permutation parameters — derived once from a constant seed, so
    signatures are identical on every worker and every run."""
    rng = np.random.default_rng(seed)
    a = rng.integers(1, _MERSENNE31, size=k, dtype=np.uint64)
    b = rng.integers(0, _MERSENNE31, size=k, dtype=np.uint64)
    return a, b


def minhash_signature(sh: np.ndarray, a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """k-wise min over (a*x+b mod 2^31-1) — vectorized (k × |shingles|),
    pure uint64 arithmetic (a, x < 2^31 ⇒ a*x < 2^62, no overflow)."""
    if len(sh) == 0:
        return np.full(len(a), _MERSENNE31, dtype=np.uint64)
    x = (sh % _MERSENNE31).astype(np.uint64)
    vals = (a[:, None] * x[None, :] + b[:, None]) % _MERSENNE31
    return vals.min(axis=1)


# Unicode-range language guesser — verbatim transposition of the reference's
# NATIVERANGES/guessFromRange/guess_lt (migrate-bvm.py:18-53). Order matters
# (first matching range wins; the duplicated Devanagari range at the end is
# shadowed, exactly as in the reference); bounds are EXCLUSIVE on both ends.
NATIVERANGES = (
    ((0x0900, 0x097F), "sa-Deva"),
    ((0x0F00, 0x0FFF), "bo"),
    ((0x0400, 0x045F), "ru"),
    ((0x2E80, 0x2EFF), "zh-Hani"),
    ((0x3000, 0x303F), "zh-Hani"),
    ((0x3200, 0x9FFF), "zh-Hani"),
    ((0xF900, 0xFAFF), "zh-Hani"),
    ((0x20000, 0x2CEAF), "zh-Hani"),
    ((0x0900, 0x097F), "zh-Hani"),
)

IAST_DIACRITICS = "ṀṃṂāĀīĪūŪṛṚṝṜḷḶḹḸḥḤṅṄñÑṭṬḍḌṇṆśŚṣṢḻḺ"


def guess_from_range(o: int) -> str | None:
    for (lo, hi), lt in NATIVERANGES:
        if lo < o < hi:
            return lt
    return None


def guess_lt(s: str, default: str = "en") -> str:
    """guess_lt (migrate-bvm.py:44-53): trailing shad → ewts; IAST
    diacritics → sa-x-iast; else the first character's Unicode range.
    (The reference raises on the empty string; here it returns ``default``.)"""
    if not s:
        return default
    if s.endswith("/"):
        return "bo-x-ewts"
    if any(c in s for c in IAST_DIACRITICS):
        return "sa-x-iast"
    fromr = guess_from_range(ord(s[0]))
    return fromr if fromr is not None else default


def simhash64(toks: list[str]) -> int:
    """Classic 64-bit SimHash over token multiset."""
    if not toks:
        return 0
    uniq, counts = np.unique(np.array(toks, dtype=object), return_counts=True)
    bits = np.zeros((len(uniq), 64), dtype=np.int64)
    for i, w in enumerate(uniq):
        h = word_hash64(w)
        bits[i] = [(h >> j) & 1 for j in range(64)]
    weights = np.where(bits == 1, 1, -1) * counts[:, None]
    acc = weights.sum(axis=0)
    out = 0
    for j in range(64):
        if acc[j] > 0:
            out |= (1 << j)
    return out


def rolling_fingerprints(toks: list[str], k: int = 5, n_keep: int = 8) -> list[int]:
    """Winnowing-style document fingerprint: the n_keep smallest k-gram
    rolling hashes (order-insensitive content sketch)."""
    sh = shingle_hashes(toks, k)
    if len(sh) == 0:
        return []
    vals = np.sort(sh & np.uint64(0x7FFFFFFFFFFFFFFF))  # int64-safe
    return [int(v) for v in vals[:n_keep]]


# dialog-act lexicons (conv_dialog_acts; shared verbatim with the SQL twin)
DIALOG_Q_WORDS = frozenset(
    "how what why when where who which is are do does did can could would "
    "should".split())
DIALOG_C_WORDS = frozenset(
    "run show list add remove update create delete set make check find "
    "write open".split())
