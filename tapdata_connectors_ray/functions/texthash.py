"""Cross-system-deterministic text hashing + tokenization primitives.

The dedup / fingerprint operators are oracle-checked against DuckDB, so the
hash and the tokenizer must produce IDENTICAL values in both engines:

- ``md5_lower64(s)``   == DuckDB ``md5_number_lower(s)``  (lower 8 bytes of
  the md5 digest, little-endian; verified empirically against DuckDB 1.0).
- ``tokens(s)``        == DuckDB ``string_split(lower(s), ' ')`` (single-space
  split, empty tokens preserved).

Scale note: md5-per-token is NOT the production hot path — it exists for
oracle parity.  Operators whose hash values never surface in output (minhash,
LSH bucketing, exact-dup grouping) use ``pandas.util.hash_array`` (vectorized
SipHash, deterministic across processes/machines for a fixed hash_key), and
the md5 paths cache per-token digests per actor (vocabulary-bounded).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

MERSENNE_31 = (1 << 31) - 1


def md5_lower64(s: str) -> int:
    """Python equivalent of DuckDB ``md5_number_lower``."""
    return int.from_bytes(hashlib.md5(s.encode()).digest()[8:16], "little")


class CachedMd5:
    """md5_lower64 with a per-instance cache — one instance per actor, so
    repeated tokens (vocabulary-bounded) hash once."""

    def __init__(self) -> None:
        self._cache: dict[str, int] = {}

    def __call__(self, s: str) -> int:
        h = self._cache.get(s)
        if h is None:
            h = md5_lower64(s)
            self._cache[s] = h
        return h

    def many(self, tokens: list[str]) -> np.ndarray:
        return np.fromiter((self(t) for t in tokens), dtype=np.uint64, count=len(tokens))


def tokens(text: str) -> list[str]:
    """DuckDB ``string_split(lower(text), ' ')`` semantics."""
    return text.lower().split(" ")


def word_ngrams(toks: list[str], n: int) -> list[str]:
    """Space-joined word n-grams ([] when the doc is shorter than n)."""
    if len(toks) < n:
        return []
    return [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]


def distinct_ngram_hashes(text: str, n: int) -> np.ndarray:
    """Sorted distinct word-n-gram hashes of a doc (vectorized SipHash —
    internal representation only, never surfaced to the oracle)."""
    grams = word_ngrams(tokens(text), n)
    if not grams:
        return np.empty(0, dtype=np.uint64)
    return np.unique(pd.util.hash_array(np.asarray(grams, dtype=object)))


def hashes_inter_union(a: np.ndarray, b: np.ndarray) -> tuple[int, int]:
    """(|A∩B|, |A∪B|) over two sorted distinct-hash arrays — kept as exact
    integers so oracle comparison never touches float rounding."""
    inter = len(np.intersect1d(a, b, assume_unique=True))
    return inter, len(a) + len(b) - inter
