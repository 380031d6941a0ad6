"""Engine/oracle hash-mode seam (functions/texthash.py).

The production default ("engine") is one vectorized SipHash call per token
buffer; "oracle" is DuckDB-parity md5 so the driver's SQL gate can reproduce
values.  These tests pin the seam's contract:

- engine mode == ``pd.util.hash_array`` bit-for-bit, and its values are
  pinned against accidental library drift (they are persisted in ledgers);
- oracle mode == ``md5_number_lower`` per token;
- exact-copy documents agree across modes for every sketch operator
  (SimHash pairs, fingerprints), and far non-pairs agree too — only
  hamming-boundary cases may legitimately differ;
- the exact-verified dedup operators are mode-invariant by construction
  (their hashes never surface; routing only).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from tapdata_connectors_ray.functions.texthash import (
    TokenHasher,
    engine_hash64,
    md5_lower64,
    row_hash64,
)

# deterministic corpus: 20 bases x 40 words, every 3rd an exact copy,
# every 3rd+1 a light perturbation (hamming-boundary near-dup)
_RNG = np.random.default_rng(42)
_VOCAB = [f"w{i}" for i in range(500)]
DOCS: list[str] = []
COPY_PAIRS: list[tuple[int, int]] = []
for i in range(20):
    words = list(_RNG.choice(_VOCAB, size=40))
    DOCS.append(" ".join(words))
    if i % 3 == 0:
        COPY_PAIRS.append((len(DOCS) - 1, len(DOCS)))
        DOCS.append(" ".join(words))
    elif i % 3 == 1:
        DOCS.append(" ".join(words[:-2] + list(_RNG.choice(_VOCAB, size=2))))


def test_engine_mode_is_vectorized_siphash_and_pinned():
    vals = engine_hash64(["hello", "world", ""])
    ref = pd.util.hash_array(np.asarray(["hello", "world", ""], dtype=object))
    assert np.array_equal(vals, ref)
    # pinned values: these persist in dedup ledgers, so silent drift in the
    # underlying library would corrupt incremental state — fail loudly here
    assert list(vals) == [
        16732354325915869343,
        7941124297996720335,
        1760245841805064774,
    ]


def test_engine_hash_nulls_batch_independent():
    """A null must hash to pd.util.hash_array's null value in BOTH branches
    (low-cardinality factorize AND near-unique passthrough) — never to the
    hash of a neighbouring real value, and never differently depending on
    the cardinality of the batch it rides in."""
    from tapdata_connectors_ray.functions.texthash import NULL_HASH64

    # library pin: hash_array's null hash is what NULL_HASH64 claims
    lib_null = pd.util.hash_array(np.asarray(["x", None, "y"], dtype=object))[1]
    assert lib_null == NULL_HASH64

    low_card = engine_hash64(np.array(["x", None, "y", "x"] * 2000, dtype=object))
    near_uniq = engine_hash64(np.array(["x", None, "y"], dtype=object))
    assert low_card[1] == near_uniq[1] == NULL_HASH64
    # null never collides with the batch's real values
    assert NULL_HASH64 not in {low_card[0], low_card[2]}
    # all-null input survives the factorize branch (empty uniq)
    assert np.array_equal(
        engine_hash64(np.array([None] * 5000, dtype=object)),
        np.full(5000, NULL_HASH64, dtype=np.uint64),
    )


def test_oracle_mode_matches_duckdb_md5():
    toks = ["a", "bb", "ccc", "a"]
    got = TokenHasher("oracle").many(toks)
    assert [int(v) for v in got] == [md5_lower64(t) for t in toks]
    assert np.array_equal(row_hash64(toks, "oracle"), got)
    assert np.array_equal(row_hash64(toks, "engine"), engine_hash64(toks))


def test_unknown_mode_rejected():
    with pytest.raises(ValueError):
        TokenHasher("sha1")


def _simhash_pairs(mode: str, max_hamming: int = 3) -> set[tuple[int, int]]:
    from tapdata_connectors_ray.stages.dedup import SimHash

    sigs = SimHash(hash_mode=mode).signatures(DOCS)
    out = set()
    for a in range(len(sigs)):
        for b in range(a + 1, len(sigs)):
            if bin(int(sigs[a]) ^ int(sigs[b])).count("1") <= max_hamming:
                out.add((a, b))
    return out


def test_simhash_modes_agree_on_copies_and_far_pairs():
    pe, po = _simhash_pairs("engine"), _simhash_pairs("oracle")
    # exact copies: hamming 0 under ANY token hash -> in both pair sets
    for p in COPY_PAIRS:
        assert p in pe and p in po
    disagreements = pe.symmetric_difference(po)
    # only hamming-boundary near-dups may differ between modes — never an
    # exact copy, and the disagreement set stays small on the pinned corpus
    assert not disagreements.intersection(COPY_PAIRS)
    assert len(disagreements) <= max(2, len(pe) // 4)


def test_fingerprint_equality_classes_agree_across_modes():
    from tapdata_connectors_ray.stages.textqc import Fingerprint

    def classes(mode: str) -> dict[int, list[int]]:
        fps = Fingerprint(hash_mode=mode).batch_fingerprints(DOCS)
        by: dict[int, list[int]] = {}
        for i, f in enumerate(fps):
            by.setdefault(int(f), []).append(i)
        return by

    ce, co = classes("engine"), classes("oracle")
    part_e = sorted(tuple(v) for v in ce.values())
    part_o = sorted(tuple(v) for v in co.values())
    # the PARTITION (who shares a fingerprint) agrees even though the
    # fingerprint VALUES are mode-specific
    assert part_e == part_o
    for a, b in COPY_PAIRS:
        assert any(a in grp and b in grp for grp in part_e)


def test_row_hash_split_is_deterministic_and_uniform_per_mode():
    ids = [str(i) for i in range(5000)]
    for mode in ("engine", "oracle"):
        h1 = row_hash64(ids, mode) % np.uint64(20)
        h2 = row_hash64(ids, mode) % np.uint64(20)
        assert np.array_equal(h1, h2)
        share = float((h1 == 3).mean())
        assert 0.03 < share < 0.07  # ~1/20 with slack
