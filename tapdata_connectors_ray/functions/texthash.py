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


# ---------------------------------------------------------------------------
# Pluggable engine/oracle hash seam
#
# The reference treats the cross-system fingerprint as a pluggable function
# (``MysqlConnector.java:782-827`` buildHashSql swaps per-DB hash SQL); we do
# the same: "engine" mode is the production default — one vectorized
# deterministic SipHash call (``pd.util.hash_array``, fixed key, stable
# across processes/machines/versions-we-pin) over the whole token buffer, no
# per-token Python — and "oracle" mode is the DuckDB-bit-parity md5 used by
# the driver-checked queries so the SQL oracle can reproduce values exactly.
# Mode contract (tests/test_hash_seam.py pins it): operators whose final
# predicate is EXACT (exact dedup, MinHash's exact-verify, n-gram Jaccard)
# produce identical outputs in both modes — the hash only routes work.
# Sketch-decided operators (SimHash hamming, fingerprints, hash-sampling
# membership) are deterministic and statistically equivalent per mode, but
# boundary cases may differ across modes: exact-copy pairs always agree,
# far non-pairs always agree, and a ledger or split must never mix modes.
# ---------------------------------------------------------------------------

HASH_MODES = ("engine", "oracle")


# pd.util.hash_array's hash for a null element (None/NaN in an object
# array) — pinned by test_hash_seam so a pandas upgrade can't silently
# desync the two branches below
NULL_HASH64 = np.uint64(0xFFFFFFFFFFFFFFFF)


def engine_hash64(values: "list[str] | np.ndarray") -> np.ndarray:
    """Vectorized 64-bit deterministic string hash (the production path).

    Token streams are Zipf-repetitive, so when a 4096-element sample looks
    low-cardinality we take the manual factorize-then-index path (measured
    ~1.35x faster than ``pd.util.hash_array`` on a 50k-vocabulary 2M-token
    buffer, identical output); near-unique inputs go straight to
    ``hash_array``, whose internal categorize is ~1.35x faster there.
    Nulls hash to ``NULL_HASH64`` in BOTH branches (``pd.factorize`` codes
    them -1, which would otherwise mis-index the last distinct value), so a
    row's hash never depends on the cardinality of its batch."""
    if len(values) == 0:
        return np.empty(0, dtype=np.uint64)
    arr = np.asarray(values, dtype=object)
    probe = arr[:4096]
    if len(pd.unique(probe)) < 0.5 * len(probe):
        codes, uniq = pd.factorize(arr)  # nulls -> code -1
        if len(uniq) == 0:
            return np.full(len(arr), NULL_HASH64, dtype=np.uint64)
        out = pd.util.hash_array(np.asarray(uniq, dtype=object))[codes]
        out[codes < 0] = NULL_HASH64
        return out
    return pd.util.hash_array(arr)


def row_hash64(values: "list[str] | np.ndarray", mode: str = "engine") -> np.ndarray:
    """Per-row 64-bit hash under the engine/oracle seam."""
    if mode == "oracle":
        return np.fromiter(
            (md5_lower64(s) for s in values), dtype=np.uint64, count=len(values)
        )
    return engine_hash64(values)


class TokenHasher:
    """Token/gram hasher behind the seam: ``many()`` is ONE vectorized call
    in engine mode; oracle mode keeps the per-actor md5 cache
    (vocabulary-bounded, so repeated tokens hash once)."""

    def __init__(self, mode: str = "engine") -> None:
        if mode not in HASH_MODES:
            raise ValueError(f"unknown hash mode {mode!r}")
        self.mode = mode
        self._md5 = CachedMd5() if mode == "oracle" else None

    def many(self, toks: "list[str] | np.ndarray") -> np.ndarray:
        if self._md5 is not None:
            return self._md5.many(list(toks))
        return engine_hash64(toks)


def word_ngrams(toks: list[str], n: int) -> list[str]:
    """Space-joined word n-grams ([] when the doc is shorter than n)."""
    if len(toks) < n:
        return []
    return [" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)]


_GRAM_PRIME = np.uint64(1099511628211)


def _avalanche(z: np.ndarray) -> np.ndarray:
    with np.errstate(over="ignore"):
        z = (z ^ (z >> np.uint64(30))) * np.uint64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> np.uint64(27))) * np.uint64(0x94D049BB133111EB)
        return z ^ (z >> np.uint64(31))


def batch_gram_hashes(texts: list[str], n: int) -> tuple[np.ndarray, np.ndarray]:
    """(per-gram doc index, per-gram hash) for every POSITIONAL word n-gram
    of a whole batch in one pass: every word is hashed once (vectorized
    SipHash), n-gram hashes are a numeric combine of consecutive word hashes
    (no gram strings are ever built).  Duplicated grams within a doc appear
    once per occurrence — callers that need set semantics dedup on top
    (``batch_distinct_gram_hashes``).  Internal representation only — gram
    hashes never surface to the oracle; collision class is the same 64 bits
    as hashing the gram strings."""
    if not texts:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.uint64)
    tok_lists = [t.lower().split(" ") for t in texts]
    wlens = np.fromiter((len(t) for t in tok_lists), np.int64, count=len(texts))
    flat = np.concatenate([np.asarray(t, dtype=object) for t in tok_lists])
    wh = pd.util.hash_array(flat)
    total = len(wh)
    m = total - n + 1
    if m <= 0:
        return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.uint64)
    with np.errstate(over="ignore"):
        gh = wh[:m].copy()
        for k in range(1, n):
            gh = gh * _GRAM_PRIME ^ wh[k : k + m]
        gh = _avalanche(gh)
    did = np.repeat(np.arange(len(texts), dtype=np.int64), wlens)
    valid = did[:m] == did[n - 1 :]  # window must not cross a doc boundary
    return did[:m][valid], gh[valid]


def batch_distinct_gram_hashes(
    texts: list[str], n: int
) -> tuple[np.ndarray, np.ndarray]:
    """(concatenated per-doc sorted-distinct gram hashes, per-doc counts):
    the positional kernel plus one lexsort for per-doc dedup."""
    did_g, gh = batch_gram_hashes(texts, n)
    if len(gh) == 0:
        return np.empty(0, dtype=np.uint64), np.zeros(len(texts), dtype=np.int64)
    order = np.lexsort((gh, did_g))
    did_s, gh_s = did_g[order], gh[order]
    keep = np.ones(len(gh_s), dtype=bool)
    keep[1:] = (did_s[1:] != did_s[:-1]) | (gh_s[1:] != gh_s[:-1])
    did_k, gh_k = did_s[keep], gh_s[keep]
    counts = np.bincount(did_k, minlength=len(texts)).astype(np.int64)
    return gh_k, counts


def distinct_ngram_hashes(text: str, n: int) -> np.ndarray:
    """Sorted distinct word-n-gram hashes of one doc (single-doc wrapper of
    the batch kernel so every call site shares the same hash values)."""
    gh, _ = batch_distinct_gram_hashes([text], n)
    return gh


def hashes_inter_union(a: np.ndarray, b: np.ndarray) -> tuple[int, int]:
    """(|A∩B|, |A∪B|) over two sorted distinct-hash arrays — kept as exact
    integers so oracle comparison never touches float rounding."""
    inter = len(np.intersect1d(a, b, assume_unique=True))
    return inter, len(a) + len(b) - inter
