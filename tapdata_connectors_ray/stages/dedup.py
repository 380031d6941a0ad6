"""Deduplication stages over a documents table: exact, MinHash+LSH, SimHash.

The reference engine has no dedup operators beyond the exactly-once event
ledger (survey §2.7) — these are the training-data-pipeline extensions, built
Ray-Data-first:

- exact dedup: hash(text) -> one groupby -> keep min doc_id per group
  (hash-partition + per-group-first; the 64-bit group hash never surfaces in
  output, the oracle groups by the text itself);
- MinHash+LSH: per-batch vectorized signatures (np.minimum.reduceat over
  concatenated shingle hashes — no per-shingle Python), banding -> ONE
  groupby on (band, band_hash) -> candidate pairs -> exact-Jaccard verify.
  Bands are sized for ~certain recall at the threshold, and every candidate
  is verified exactly, so the output equals brute-force pairs — which is
  what the DuckDB oracle computes;
- SimHash: 64-bit signature per doc (md5-token parity with the oracle),
  candidates via 4x16-bit chunk banding (pigeonhole-exact for hamming<=3).

Scale notes (100 TB): candidate verification is a distributed hash join of
candidate pairs against a (doc_id, shingles) dataset — nothing touches the
driver; per-doc gram counts likewise flow as a dataset joined into the final
jaccard filter; the inverted index applies a document-frequency cutoff
(``GRAM_DF_CUTOFF``, mirrored in the oracle) so no stop-gram can go
quadratic.  A 64-bit group hash collides at ~2^32 docs; the scale path
widens exact-dup grouping to a 128-bit digest.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from tapdata_connectors_ray.functions.texthash import (
    MERSENNE_31,
    TokenHasher,
    batch_distinct_gram_hashes,
    tokens,
)

# ---------------------------------------------------------------------------
# corpus augmentation (shared with the oracle SQL in pipelines/training.py)
# ---------------------------------------------------------------------------

EXACT_COPY_OFFSET = 1_000_000
NEARDUP_COPY_OFFSET = 2_000_000


def augment_docs(batch: pa.Table) -> pa.Table:
    """documents -> (doc_id, text) plus deterministic duplicate copies:

    - every doc_id % 5 == 0: a verbatim copy at doc_id + 1e6;
    - every doc_id % 5 == 1: a near-dup copy at doc_id + 2e6 keeping the
      first max(5, n_words - 7) words.

    Mirrored verbatim by the ``aug`` CTE in the oracle SQL (list slicing in
    DuckDB is 1-based inclusive == Python ``words[:k]``).
    """
    doc_id = batch["doc_id"].to_numpy()
    text = batch["text"].to_pylist()

    out_ids: list[np.ndarray] = [doc_id]
    out_text: list[list[str]] = [text]

    exact_mask = doc_id % 5 == 0
    out_ids.append(doc_id[exact_mask] + EXACT_COPY_OFFSET)
    out_text.append([t for t, m in zip(text, exact_mask) if m])

    near_mask = doc_id % 5 == 1
    perturbed = []
    for t, m in zip(text, near_mask):
        if m:
            words = t.split(" ")
            k = max(5, len(words) - 7)
            perturbed.append(" ".join(words[:k]))
    out_ids.append(doc_id[near_mask] + NEARDUP_COPY_OFFSET)
    out_text.append(perturbed)

    return pa.table(
        {
            "doc_id": pa.array(np.concatenate(out_ids), type=pa.int64()),
            "text": pa.array([t for chunk in out_text for t in chunk], type=pa.string()),
        }
    )


# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def add_text_hash(batch: pa.Table) -> pa.Table:
    """64-bit deterministic content hash column (internal grouping key).
    Reinterpreted as int64: Ray's sort shuffle handles signed ints natively
    but falls off a slow path on uint64 keys."""
    h = pd.util.hash_array(np.asarray(batch["text"].to_pylist(), dtype=object))
    return batch.append_column("text_hash", pa.array(h.view(np.int64), type=pa.int64()))


# ---------------------------------------------------------------------------
# MinHash + LSH banding
# ---------------------------------------------------------------------------


class MinHashLSH:
    """Stateful map_batches stage: doc -> LSH band rows.

    ``__init__`` (once per actor) materializes the permutation coefficients;
    ``__call__`` computes, per batch, minhash signatures for every doc with
    one ``np.minimum.reduceat`` over the concatenated shingle-hash matrix,
    then emits ``num_bands`` rows per doc keyed by the band digest.
    """

    def __init__(
        self,
        ngram: int = 3,
        num_perm: int = 128,
        num_bands: int = 64,
        with_text_hash: bool = False,
    ):
        assert num_perm % num_bands == 0
        self.ngram = ngram
        self.num_perm = num_perm
        self.num_bands = num_bands
        self.rows_per_band = num_perm // num_bands
        # with_text_hash attaches the exact-content hash to every band row so
        # the pair stage can collapse exact-duplicate clusters to one
        # representative per (band, bucket) — the occupancy guard.  It is
        # read from the input's ``text_hash`` column when present (profile
        # input) and computed from the text otherwise.
        self.with_text_hash = with_text_hash
        rng = np.random.default_rng(0xC0FFEE)
        self.a = rng.integers(1, MERSENNE_31, size=num_perm, dtype=np.uint64)
        self.b = rng.integers(0, MERSENNE_31, size=num_perm, dtype=np.uint64)

    def signatures_from_hashes(
        self, concat: np.ndarray, lens: np.ndarray
    ) -> np.ndarray:
        """(concatenated distinct gram hashes, per-doc lens) ->
        sig[n_docs, num_perm]: one permute matrix + segment-min
        (``np.minimum.reduceat``) for the whole batch."""
        sigs = np.full((len(lens), self.num_perm), MERSENNE_31, dtype=np.uint64)
        nonempty = lens > 0
        if nonempty.any():
            concat = concat % MERSENNE_31
            # (n_shingles_total, num_perm) permuted hashes, segment-min per
            # doc.  a*h+b < 2^62, reduced mod the Mersenne prime by two
            # shift-add folds + one conditional subtract — ~3x faster than
            # np.mod's 64-bit division on the dominant matrix.  The permute
            # matrix is computed in perm-column chunks so peak memory per
            # task stays ~n_shingles x 16 x 8 B regardless of num_perm.
            m = np.uint64(MERSENNE_31)
            s31 = np.uint64(31)
            starts = np.zeros(int(nonempty.sum()), dtype=np.int64)
            starts[1:] = np.cumsum(lens[nonempty])[:-1]
            col = concat[:, None]
            for lo in range(0, self.num_perm, 16):
                hi = min(lo + 16, self.num_perm)
                perm = col * self.a[None, lo:hi] + self.b[None, lo:hi]
                perm = (perm >> s31) + (perm & m)
                perm = (perm >> s31) + (perm & m)
                np.subtract(perm, m, out=perm, where=perm >= m)
                sigs[nonempty, lo:hi] = np.minimum.reduceat(perm, starts, axis=0)
        return sigs

    def signatures(self, texts: list[str]) -> tuple[np.ndarray, np.ndarray]:
        """Returns (sig[n_docs, num_perm], n_shingles[n_docs]) — ONE
        vectorized gram-hash pass for the whole batch, then segment-min."""
        concat, lens = batch_distinct_gram_hashes(texts, self.ngram)
        return self.signatures_from_hashes(concat, lens), lens

    def __call__(self, batch: pa.Table) -> pa.Table:
        doc_id = batch["doc_id"].to_numpy()
        if "shingles" in batch.column_names:
            # profile input (``doc_profile_batch``): signatures from the
            # already-hashed shingle blobs — no re-shingling pass
            blobs = batch["shingles"].to_pylist()
            lens = np.fromiter((len(x) >> 3 for x in blobs), np.int64, count=len(blobs))
            concat = np.frombuffer(b"".join(blobs), dtype=np.uint64)
            sigs = self.signatures_from_hashes(concat, lens)
            th_all = (
                batch["text_hash"].to_numpy() if self.with_text_hash else None
            )
        else:
            texts = batch["text"].to_pylist()
            sigs, lens = self.signatures(texts)
            th_all = (
                pd.util.hash_array(np.asarray(texts, dtype=object)).view(np.int64)
                if self.with_text_hash
                else None
            )
        keep = lens > 0  # shingle-less docs can't be near-dups
        sigs, ids = sigs[keep], doc_id[keep]
        n = len(ids)
        band_sigs = sigs.reshape(n, self.num_bands, self.rows_per_band)
        # digest each band to one uint64 bucket key
        mix = np.uint64(0x9E3779B97F4A7C15)
        digest = np.zeros((n, self.num_bands), dtype=np.uint64)
        for r in range(self.rows_per_band):
            digest = (digest * mix) ^ band_sigs[:, :, r]
        band_idx = np.broadcast_to(np.arange(self.num_bands, dtype=np.int32), (n, self.num_bands))
        cols = {
            "band": pa.array(band_idx.ravel(), type=pa.int32()),
            "bucket": pa.array(digest.ravel(), type=pa.uint64()),
            # coarse shuffle key: O(256) groups, each one vectorized merge
            "sbucket": pa.array((digest.ravel() & np.uint64(255)).astype(np.int32)),
            "doc_id": pa.array(np.repeat(ids, self.num_bands), type=pa.int64()),
        }
        if th_all is not None:
            cols["text_hash"] = pa.array(
                np.repeat(th_all[keep], self.num_bands), type=pa.int64()
            )
        return pa.table(cols)


def band_pairs_bucket(df: pd.DataFrame) -> pd.DataFrame:
    """One coarse shuffle bucket of LSH band rows -> distinct candidate
    pairs, fully vectorized: pandas self-merge on the exact (band, bucket)
    key.  The coarse bucket (``sbucket``) exists only to keep group count =
    O(256), not O(#buckets), so the shuffle stays cheap and the per-group
    work is one vectorized merge.

    Occupancy guard: when band rows carry ``text_hash`` (the minhash query's
    exact-dedup prefilter), each exact-duplicate cluster collapses to its
    min-doc_id representative inside every (band, bucket) BEFORE the
    self-merge — all copies share one signature, so the per-bucket
    representative is the cluster's global min and candidate pairs come out
    canonically rep-to-rep.  The m² term is then bounded by the number of
    DISTINCT texts sharing a band digest (adversarial near-dup floods are
    further damped by the verify stage; exact floods — the common corpus
    pathology — cost O(m) here instead of O(64·m²))."""
    if "text_hash" in df.columns:
        df = df.sort_values("doc_id").drop_duplicates(
            ["band", "bucket", "text_hash"], keep="first"
        )
    m = df.merge(df, on=["band", "bucket"], suffixes=("_l", "_r"))
    m = m[m["doc_id_l"] < m["doc_id_r"]]
    out = m[["doc_id_l", "doc_id_r"]].drop_duplicates()
    return out.rename(columns={"doc_id_l": "doc_a", "doc_id_r": "doc_b"})


# A gram shared by more docs than this contributes no candidate pairs: the
# per-gram self-merge is O(df²), so one stop-gram shared by 10^6 docs would
# emit 10^12 pair rows.  Standard inverted-index practice; the oracle's
# filtered-inter CTE applies the same cutoff, so conformance is exact.
GRAM_DF_CUTOFF = 256


def gram_pair_partials(df: pd.DataFrame) -> pd.DataFrame:
    """One coarse bucket of inverted-index rows -> per-pair partial common
    counts (vectorized merge on the exact gram hash; the global common count
    is the Sum over buckets because each distinct gram lives in exactly one
    bucket — which also makes the document-frequency cutoff exact here)."""
    dfreq = df.groupby("gram", sort=False)["doc_id"].transform("size")
    df = df[dfreq <= GRAM_DF_CUTOFF]
    m = df.merge(df, on="gram", suffixes=("_l", "_r"))
    m = m[m["doc_id_l"] < m["doc_id_r"]]
    g = (
        m.groupby(["doc_id_l", "doc_id_r"], sort=False)
        .size()
        .reset_index(name="common_part")
    )
    return g.rename(columns={"doc_id_l": "doc_a", "doc_id_r": "doc_b"})


def add_pair_bucket(batch: pa.Table) -> pa.Table:
    """Derived int32 shuffle key for pair-keyed reduces: Ray's grouped
    aggregate pays per-group overhead, so pair-level groupbys (10^4..10^6
    groups) go through a coarse 256-bucket groupby with one vectorized
    pandas reduce per bucket instead."""
    a = batch["doc_a"].to_numpy()
    b = batch["doc_b"].to_numpy()
    h = ((a * 1_000_003 + b) & 255).astype(np.int32)
    return batch.append_column("pbucket", pa.array(h))


def pair_sum_bucket(df: pd.DataFrame) -> pd.DataFrame:
    """One pair bucket: sum partial common counts to the exact global count
    (each (a,b) pair maps to exactly one bucket)."""
    g = (
        df.groupby(["doc_a", "doc_b"], sort=False)["common_part"]
        .sum()
        .reset_index(name="common")
    )
    return g


def pair_dedupe_bucket(df: pd.DataFrame) -> pd.DataFrame:
    """One pair bucket: drop duplicate candidate pairs (vectorized)."""
    return df.drop_duplicates(["doc_a", "doc_b"]).drop(columns=["pbucket"])


def doc_profile_batch(ngram: int, n_buckets: int = 256):
    """map_batches fn: docs -> the per-doc dedup PROFILE
    (doc_id, text_hash, n_grams, hbucket, shingles) — text is hashed and
    shingled exactly once; every downstream branch of the minhash query
    (banding, join-verify side table, exact-dup cluster fold) reads this
    instead of re-scanning + re-shingling the corpus.  ``shingles`` is the
    distinct gram-hash set as a uint64le blob (Arrow's hash join rejects
    list payload columns)."""

    def f(batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        ids = batch["doc_id"].to_numpy()
        th = pd.util.hash_array(np.asarray(texts, dtype=object))
        concat, lens = batch_distinct_gram_hashes(texts, ngram)
        parts = np.split(concat, np.cumsum(lens)[:-1])
        return pa.table(
            {
                "doc_id": pa.array(ids, type=pa.int64()),
                "text_hash": pa.array(th.view(np.int64), type=pa.int64()),
                "n_grams": pa.array(lens, type=pa.int64()),
                "hbucket": pa.array((th % np.uint64(n_buckets)).astype(np.int32)),
                "shingles": pa.array([p.tobytes() for p in parts], type=pa.binary()),
            }
        )

    return f


def cluster_members_bucket(df: pd.DataFrame) -> pd.DataFrame:
    """One text-hash bucket -> exact-dup cluster membership rows
    (doc_id, rep_id = min doc_id of the cluster, n_grams, csize), one
    vectorized transform per bucket (each distinct text lives in exactly one
    bucket, so rep/csize are globally exact)."""
    g = df.groupby("text_hash", sort=False)["doc_id"]
    return pd.DataFrame(
        {
            "doc_id": df["doc_id"],
            "rep_id": g.transform("min"),
            "n_grams": df["n_grams"],
            "csize": g.transform("size"),
        }
    ).reset_index(drop=True)


def doc_gram_count_batch(ngram: int):
    """map_batches fn: (doc_id, n_grams) — the per-doc distinct-gram counts
    as a DATASET (joined against candidate pairs downstream), replacing the
    driver-built broadcast dict the round-1 design used."""

    def f(batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        _, counts = batch_distinct_gram_hashes(texts, ngram)
        return pa.table(
            {
                "doc_id": batch["doc_id"].cast(pa.int64()),
                "n_grams": pa.array(counts, type=pa.int64()),
            }
        )

    return f


def union_filter_batch(batch: pa.Table, threshold: float) -> pa.Table:
    """Final jaccard filter over join output carrying na/nb gram counts:
    union = n_a + n_b - common; same IEEE division as the oracle's WHERE."""
    a = batch["doc_a"].to_numpy()
    b = batch["doc_b"].to_numpy()
    common = batch["common"].to_numpy().astype(np.int64)
    na = batch["na"].to_numpy().astype(np.int64)
    nb = batch["nb"].to_numpy().astype(np.int64)
    union = na + nb - common
    keep = (union > 0) & (common / np.maximum(union, 1) >= threshold)
    return pa.table(
        {
            "doc_a": pa.array(a[keep], type=pa.int64()),
            "doc_b": pa.array(b[keep], type=pa.int64()),
            "common": pa.array(common[keep], type=pa.int64()),
            "union_n": pa.array(union[keep], type=pa.int64()),
        }
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

SIMHASH_CHUNKS = 4  # 4 x 16-bit chunks: pigeonhole-exact for hamming <= 3


class SimHash:
    """map_batches stage: doc -> (doc_id, simhash).

    Token hash is behind the engine/oracle seam (``TokenHasher``): the
    default "engine" mode is ONE vectorized SipHash call over the whole
    token buffer (the production path — no per-token Python); "oracle" mode
    is md5_number_lower (DuckDB bit-parity, per-actor cached) so the
    driver-checked queries can reproduce signature values in SQL.  A ledger
    (incremental simhash) must never mix modes across epochs — the mode is
    part of the signature spec.
    Signatures are computed for the WHOLE batch in one pass: all docs'
    token hashes concatenate into one matrix, the per-doc bit-score sums
    are segment reductions (``np.add.reduceat``) — the same trick the
    MinHash stage uses; no per-document Python loop.
    """

    def __init__(self, hash_mode: str = "engine") -> None:
        self.hasher = TokenHasher(hash_mode)

    def signatures(self, texts: list[str]) -> np.ndarray:
        tok_lists = [tokens(t) for t in texts]
        lens = np.array([len(t) for t in tok_lists], dtype=np.int64)
        flat = [t for toks_ in tok_lists for t in toks_]
        h = self.hasher.many(flat)
        # (total_tokens, 64) ±1 contributions, segment-summed per doc
        bits = ((h[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & np.uint64(1))
        contrib = (2 * bits.astype(np.int32) - 1)
        starts = np.zeros(len(texts), dtype=np.int64)
        starts[1:] = np.cumsum(lens)[:-1]
        scores = np.add.reduceat(contrib, starts, axis=0)  # (n_docs, 64)
        powers = np.uint64(1) << np.arange(64, dtype=np.uint64)
        return ((scores > 0).astype(np.uint64) * powers[None, :]).sum(
            axis=1, dtype=np.uint64
        )

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        doc_id = batch["doc_id"].to_numpy()
        sigs = self.signatures(texts)
        return pa.table(
            {
                "doc_id": pa.array(doc_id, type=pa.int64()),
                "simhash": pa.array(sigs, type=pa.uint64()),
            }
        )


def simhash_chunk_rows(batch: pa.Table) -> pa.Table:
    """Explode signatures into (chunk_idx, chunk_value, doc_id, simhash)."""
    sig = batch["simhash"].to_numpy()
    doc_id = batch["doc_id"].to_numpy()
    n = len(sig)
    chunks = np.empty((n, SIMHASH_CHUNKS), dtype=np.uint64)
    for c in range(SIMHASH_CHUNKS):
        chunks[:, c] = (sig >> np.uint64(16 * c)) & np.uint64(0xFFFF)
    idx = np.broadcast_to(np.arange(SIMHASH_CHUNKS, dtype=np.int32), (n, SIMHASH_CHUNKS))
    return pa.table(
        {
            "chunk_idx": pa.array(idx.ravel(), type=pa.int32()),
            "chunk_val": pa.array(chunks.ravel(), type=pa.uint64()),
            "cbucket": pa.array((chunks.ravel() & np.uint64(255)).astype(np.int32)),
            "doc_id": pa.array(np.repeat(doc_id, SIMHASH_CHUNKS), type=pa.int64()),
            "simhash": pa.array(np.repeat(sig, SIMHASH_CHUNKS), type=pa.uint64()),
        }
    )


def simhash_pairs_bucket(df: pd.DataFrame) -> pd.DataFrame:
    """One coarse bucket of chunk rows -> candidate pairs with signatures
    (vectorized merge on the exact (chunk_idx, chunk_val) key)."""
    m = df.merge(df, on=["chunk_idx", "chunk_val"], suffixes=("_l", "_r"))
    m = m[m["doc_id_l"] < m["doc_id_r"]]
    out = m[["doc_id_l", "doc_id_r", "simhash_l", "simhash_r"]].drop_duplicates(
        ["doc_id_l", "doc_id_r"]
    )
    return out.rename(
        columns={
            "doc_id_l": "doc_a",
            "doc_id_r": "doc_b",
            "simhash_l": "sig_a",
            "simhash_r": "sig_b",
        }
    )


def _popcount64(x: np.ndarray) -> np.ndarray:
    """Vectorized 64-bit popcount (numpy<2 has no bitwise_count)."""
    return np.unpackbits(x.view(np.uint8)).reshape(len(x), 8 * 8).sum(axis=1)


def hamming_filter(batch: pa.Table, max_hamming: int = 3) -> pa.Table:
    a = batch["sig_a"].to_numpy().astype(np.uint64)
    b = batch["sig_b"].to_numpy().astype(np.uint64)
    if len(a) == 0:
        return pa.table(
            {"doc_a": pa.array([], type=pa.int64()), "doc_b": pa.array([], type=pa.int64()),
             "hamming": pa.array([], type=pa.int64())}
        )
    ham = _popcount64(a ^ b).astype(np.int64)
    keep = ham <= max_hamming
    return pa.table(
        {
            "doc_a": pa.array(batch["doc_a"].to_numpy()[keep], type=pa.int64()),
            "doc_b": pa.array(batch["doc_b"].to_numpy()[keep], type=pa.int64()),
            "hamming": pa.array(ham[keep], type=pa.int64()),
        }
    )


def verify_pairs_batch(batch: pa.Table, threshold: float) -> pa.Table:
    """Exact-Jaccard verify over joined pair rows carrying both docs' shingle
    blobs (columns shingles_a / shingles_b), vectorized across ALL pairs in
    the batch: one concatenated (pair_id, hash) lexsort counts, per pair, the
    values present on both sides (each side's hashes are distinct, so a
    within-pair duplicate == an intersection hit).  No per-pair Python loop."""
    a = batch["doc_a"].to_numpy()
    b = batch["doc_b"].to_numpy()
    n = len(a)
    if n == 0:
        common = np.empty(0, dtype=np.int64)
        union = np.empty(0, dtype=np.int64)
    else:
        sa = batch["shingles_a"].to_pylist()
        sb = batch["shingles_b"].to_pylist()
        la = np.fromiter((len(x) >> 3 for x in sa), np.int64, count=n)
        lb = np.fromiter((len(y) >> 3 for y in sb), np.int64, count=n)
        vals = np.frombuffer(b"".join(sa) + b"".join(sb), dtype=np.uint64)
        pid = np.concatenate(
            [np.repeat(np.arange(n, dtype=np.int64), la),
             np.repeat(np.arange(n, dtype=np.int64), lb)]
        )
        order = np.lexsort((vals, pid))
        pid_s, vals_s = pid[order], vals[order]
        dup = (pid_s[1:] == pid_s[:-1]) & (vals_s[1:] == vals_s[:-1])
        common = np.bincount(pid_s[1:][dup], minlength=n).astype(np.int64)
        union = la + lb - common
    keep = (union > 0) & (common / np.maximum(union, 1) >= threshold)
    return pa.table(
        {
            "doc_a": pa.array(a[keep], type=pa.int64()),
            "doc_b": pa.array(b[keep], type=pa.int64()),
            "common": pa.array(common[keep], type=pa.int64()),
            "union_n": pa.array(union[keep], type=pa.int64()),
        }
    )


def ngram_index_rows(ngram: int):
    """map_batches fn: explode docs into (gram_hash, doc_id) inverted-index
    rows plus implicit distinct-gram counting downstream."""

    def explode(batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        ids = batch["doc_id"].to_numpy()
        grams, lens = batch_distinct_gram_hashes(texts, ngram)
        return pa.table(
            {
                "gram": pa.array(grams, type=pa.uint64()),
                "bucket": pa.array((grams & np.uint64(255)).astype(np.int32)),
                "doc_id": pa.array(np.repeat(ids, lens), type=pa.int64()),
            }
        )

    return explode


# ---------------------------------------------------------------------------
# connected components over a duplicate-pair graph
# ---------------------------------------------------------------------------


def symmetrize_pairs(batch: pa.Table) -> pa.Table:
    """(doc_a, doc_b) pairs -> both edge directions (src, dst)."""
    a = batch["doc_a"].to_numpy()
    b = batch["doc_b"].to_numpy()
    return pa.table(
        {
            "src": pa.array(np.concatenate([a, b]), type=pa.int64()),
            "dst": pa.array(np.concatenate([b, a]), type=pa.int64()),
        }
    )


# two-regime threshold (the BROADCAST_FLAG_CAP / LSH_CANDIDATE_CAP pattern):
# a pair list is candidate-scale (near-dup PAIRS, not documents), so below
# the cap a driver-local union-find is both exact and ~free; above it the
# distributed hash-min loop takes over
CC_PAIR_CAP = 2_000_000

_CC_N_BUCKETS = 256  # coarse int32 bucket: Ray grouped folds pay per GROUP


def _cc_msg_table(k: np.ndarray, v: np.ndarray, is_edge: np.ndarray) -> pa.Table:
    return pa.table(
        {
            "bucket": pa.array((k % _CC_N_BUCKETS).astype(np.int32), type=pa.int32()),
            "k": pa.array(k, type=pa.int64()),
            "v": pa.array(v, type=pa.int64()),
            "is_edge": pa.array(is_edge, type=pa.int64()),
        }
    )


def _cc_label_table(ids: np.ndarray, lbl: np.ndarray) -> pa.Table:
    return pa.table(
        {
            "bucket": pa.array(
                (ids % _CC_N_BUCKETS).astype(np.int32), type=pa.int32()
            ),
            "id": pa.array(ids, type=pa.int64()),
            "label": pa.array(lbl, type=pa.int64()),
        }
    )


def _cc_propagate_fold(df: pd.DataFrame) -> pa.Table:
    """One bucket of the (edges ∪ labels) union: send every node's current
    label (its is_edge==0 row; own id when absent, i.e. round 1) to itself
    and to each edge's destination.  Fully vectorized — one reindex over the
    bucket's label map."""
    lab = df[df["is_edge"] == 0]
    lk = lab["k"].to_numpy(dtype=np.int64)
    lv = lab["v"].to_numpy(dtype=np.int64)
    order = np.argsort(lk)
    lk, lv = lk[order], lv[order]
    edges = df[df["is_edge"] == 1]
    ek = edges["k"].to_numpy(dtype=np.int64)
    # exact int64 lookup (searchsorted — no float round-trip, no pandas
    # duplicate-index alignment); missing => round 1 => the node's own id
    if len(lk):
        pos = np.minimum(np.searchsorted(lk, ek), len(lk) - 1)
        elbl = np.where(lk[pos] == ek, lv[pos], ek)
    else:
        elbl = ek
    # self-carry: every node that has a label row keeps it; round 1 (no
    # label rows) carries each edge source's own id instead
    ids = np.concatenate([edges["v"].to_numpy(dtype=np.int64), lk if len(lk) else ek])
    lbl = np.concatenate([elbl, lv if len(lk) else ek])
    return _cc_label_table(ids, lbl)


def _cc_min_fold(df: pd.DataFrame) -> pa.Table:
    out = df.groupby("id", as_index=False)["label"].min()
    return _cc_label_table(
        out["id"].to_numpy(dtype=np.int64), out["label"].to_numpy(dtype=np.int64)
    )


def _cc_driver_union_find(pairs) -> "pa.Table":
    """Exact union-find over a driver-collected pair frame (narrow: two
    int64 columns).  Path-halving keeps it near-linear."""
    df = pairs.to_pandas()
    a = df["doc_a"].to_numpy(dtype=np.int64)
    b = df["doc_b"].to_numpy(dtype=np.int64)
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in zip(a.tolist(), b.tolist()):
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    nodes = np.fromiter(parent.keys(), dtype=np.int64, count=len(parent))
    roots = np.fromiter((find(int(x)) for x in nodes), dtype=np.int64, count=len(nodes))
    # normalize roots to the min member (find already unions toward min)
    return pa.table(
        {"id": pa.array(nodes, type=pa.int64()), "label": pa.array(roots, type=pa.int64())}
    )


def connected_components(
    pairs, num_partitions: int, max_iters: int = 50, pair_cap: int = CC_PAIR_CAP
):
    """Connected components of a (doc_a, doc_b) pair Dataset: every node's
    label converges to the smallest doc_id in its component.

    Two-regime: pair graphs are candidate-scale, so up to ``pair_cap`` pairs
    a driver-local union-find answers exactly (the BROADCAST_FLAG_CAP
    pattern); above it a distributed hash-min loop with POINTER JUMPING runs
    entirely as coarse-bucketed, pinned-schema ``map_groups`` folds.

    The distributed loop: each round unions three message kinds keyed on a
    256-way node bucket — edge messages (k=src, v=dst), label self-carries
    (k=node, v=label), and jump messages (k=label, v=node: the node asks its
    current label's node for THAT node's label — label(label(v)), which
    collapses chains in O(log diameter) rounds instead of O(diameter)) —
    then one fold broadcasts each node's label along its messages and a
    second fold min-reduces per node.  Only 24-byte rows shuffle; the
    payload never moves.  Deliberately join-free: ``Dataset.join`` unifies
    zero-column empty partitions from upstream operators into schema-less
    tables (SURVEY §8.5), while pinned-schema folds cannot be poisoned.

    Convergence is detected by the label SUM, a scalar aggregate:
    min-propagation is monotone non-increasing per node, so an unchanged
    sum IS a fixpoint.

    Returns a Dataset with columns (id, label).
    """
    import ray.data

    if pairs.count() <= pair_cap:
        return ray.data.from_arrow(_cc_driver_union_find(pairs))

    def edge_msg_batch(b: pa.Table) -> pa.Table:
        a = b["doc_a"].to_numpy()
        c = b["doc_b"].to_numpy()
        k = np.concatenate([a, c])
        return _cc_msg_table(
            k, np.concatenate([c, a]), np.ones(len(k), dtype=np.int64)
        )

    def label_msg_batch(b: pa.Table) -> pa.Table:
        ids = b["id"].to_numpy()
        lbl = b["label"].to_numpy()
        k = np.concatenate([ids, lbl])
        v = np.concatenate([lbl, ids])
        is_edge = np.concatenate(
            [np.zeros(len(ids), dtype=np.int64), np.ones(len(ids), dtype=np.int64)]
        )
        return _cc_msg_table(k, v, is_edge)

    edge_msgs = pairs.map_batches(
        edge_msg_batch, batch_format="pyarrow", zero_copy_batch=True
    ).materialize()
    labels = None
    prev = None
    for _ in range(max_iters):
        msgs = edge_msgs
        if labels is not None:
            msgs = msgs.union(
                labels.map_batches(
                    label_msg_batch, batch_format="pyarrow", zero_copy_batch=True
                )
            )
        labels = (
            msgs.groupby("bucket")
            .map_groups(_cc_propagate_fold, batch_format="pandas")
            .groupby("bucket")
            .map_groups(_cc_min_fold, batch_format="pandas")
            .materialize()
        )
        cur = labels.sum("label")
        if cur == prev:
            break
        prev = cur
    return labels.select_columns(["id", "label"])
