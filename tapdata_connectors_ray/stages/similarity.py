"""Similarity search over an embedding column (``list<float>``).

Training-data-pipeline extension (the reference has no vector ops):

- brute-force cosine top-k: the query matrix is broadcast ONCE via
  ``ray.put``; each ``map_batches`` task does one float64 matmul of its
  batch against the queries and emits only its local top-k candidates, so
  the driver-side final reduce sees k rows per (query, block), not the
  corpus;
- IVF top-k: cells = the ``label`` column (a pre-computed clustering);
  centroids are a metadata-scale grouped mean; queries probe the
  ``nprobe`` nearest centroids and brute-force only those cells — the
  classic inverted-file ANN layout, expressed as a filter pushed into the
  same batched matmul;
- cosine near-dup pairs: block x broadcast-corpus matmul, emit pairs above
  a threshold (the embedding analogue of MinHash dedup).  Scale path: the
  broadcast side becomes LSH-bucketed (random hyperplanes) so each block
  multiplies against its bucket only.

All arithmetic is float64 after an exact float32->float64 widen, matching
DuckDB's ``list_cosine_similarity(CAST(...AS DOUBLE[]))`` to ~1 ulp; outputs
round to 5 decimals before the threshold/compare.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa


def stack_embeddings(batch: pa.Table, col: str = "embedding") -> np.ndarray:
    """(n, d) float64 matrix from a list<float> column (zero-copy flatten)."""
    arr = batch[col].combine_chunks()
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    flat = arr.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
    n = len(arr)
    return flat.reshape(n, -1)


def normalize_rows(m: np.ndarray) -> np.ndarray:
    norms = np.sqrt((m * m).sum(axis=1, keepdims=True))
    norms[norms == 0] = 1.0
    return m / norms


class BruteForceTopK:
    """map_batches stage: batch-local top-k cosine vs broadcast queries."""

    def __init__(self, queries_ref, k: int):
        import ray

        q = ray.get(queries_ref)  # {"ids": (m,), "mat": (m, d) normalized}
        self.q_ids = q["ids"]
        self.q_mat = q["mat"]
        self.k = k

    @staticmethod
    def block_topk(cand_ids: np.ndarray, cand_sims: np.ndarray, k: int):
        """Per-block top-k under the GLOBAL total order (-sim, neighbor_id)
        — the oracle's tie-break.  Any global top-k row is in its block's
        top-k under the same total order, so truncating here is lossless;
        an argpartition that keeps an arbitrary member of a sim-tied group
        is not (a dropped smaller-id tied neighbor can't be recovered)."""
        if len(cand_ids) > k:
            order = np.lexsort((cand_ids, -cand_sims))[:k]
            return cand_ids[order], cand_sims[order]
        return cand_ids, cand_sims

    def __call__(self, batch: pa.Table) -> pa.Table:
        mat = normalize_rows(stack_embeddings(batch))
        ids = batch["vec_id"].to_numpy()
        sims = mat @ self.q_mat.T  # (n, m)
        out_q, out_n, out_s = [], [], []
        for j, qid in enumerate(self.q_ids):
            col = sims[:, j]
            mask = ids != qid  # exclude self-match
            cand_ids, cand_sims = self.block_topk(ids[mask], col[mask], self.k)
            out_q.append(np.full(len(cand_ids), qid, dtype=np.int64))
            out_n.append(cand_ids)
            out_s.append(cand_sims)
        return pa.table(
            {
                "query_id": pa.array(np.concatenate(out_q), type=pa.int64()),
                "neighbor_id": pa.array(np.concatenate(out_n), type=pa.int64()),
                "sim": pa.array(np.concatenate(out_s), type=pa.float64()),
            }
        )


def final_topk(candidates: pd.DataFrame, k: int) -> pd.DataFrame:
    """Driver-side reduce of per-block candidates (k x blocks rows)."""
    df = candidates.sort_values(
        ["query_id", "sim", "neighbor_id"], ascending=[True, False, True], kind="stable"
    )
    df = df.groupby("query_id", sort=True).head(k).reset_index(drop=True)
    df["sim"] = df["sim"].round(5)
    return df[["query_id", "neighbor_id", "sim"]]


def adaptive_hyperplane_params(
    n_rows: int,
    threshold: float = 0.9,
    max_miss: float = 1e-7,
    false_per_vec: float = 64.0,
    min_bands: int = 48,
    min_rows: int = 8,
    max_rows: int = 32,
) -> tuple[int, int]:
    """(num_bands, rows_per_band) sized to the corpus so candidate volume
    stays O(n), not O(n²).

    Fixed ``rows_per_band`` is a quadratic time bomb: a random
    (near-orthogonal) pair collides in one band with p = 0.5**r, so expected
    FALSE candidates are C(n,2)·B·0.5**r — with the old constant (48, 8)
    that is ~54 M pairs at n=24k and grows with n², which is exactly the
    "works at sf0.1, dies at 1000x" failure mode this engine is designed
    against.  This helper solves the fixed point of

        r = ceil(log2(n · B / false_per_vec))   # false candidates ≈ n·false_per_vec
        B = ceil(ln(max_miss) / ln(1 - p_bit**r))  # recall at `threshold`

    where p_bit = 1 - acos(threshold)/pi (sign-random-projection collision
    probability).  Every candidate is exactly verified downstream, so the
    output still equals brute force up to the per-true-pair miss bound
    ``max_miss`` (1e-7: ~0.0002 expected misses even if 2k true pairs sat
    EXACTLY at the threshold; real near-dups sit far above it and miss with
    p < 1e-12).  The incremental ledger path keeps its pinned (48, 8) —
    band params there are part of the on-disk ledger contract and must not
    drift with corpus size between epochs.
    """
    import math

    p_bit = 1.0 - math.acos(min(max(threshold, -1.0), 1.0)) / math.pi
    r, bands = min_rows, min_bands
    for _ in range(8):
        r_new = int(
            min(
                max(min_rows, math.ceil(math.log2(max(n_rows, 2) * bands / false_per_vec))),
                max_rows,
            )
        )
        p_band = p_bit**r_new
        bands_new = max(min_bands, math.ceil(math.log(max_miss) / math.log1p(-p_band)))
        if (r_new, bands_new) == (r, bands):
            break
        r, bands = r_new, bands_new
    return bands, r


class HyperplaneLSH:
    """map_batches stage: embedding rows -> random-hyperplane LSH band rows
    (same (band, bucket, sbucket, doc_id) layout as the MinHash banding, so
    the candidate-pair machinery is shared).

    Sign-random-projection: P[bit agrees] = 1 - angle/pi.  At the 0.9-cosine
    threshold (angle <= 0.451 rad) a band of ``rows_per_band=8`` bits matches
    with p >= 0.29, so 48 bands miss a true pair with p <= (1-0.29)^48 ~ 7e-8
    — recall is effectively total, and every candidate is exactly verified,
    so output equals brute force (deterministic hyperplanes, seed-fixed).
    Scale knobs: more rows_per_band shrinks buckets (O(n/2^r) per band);
    more bands restores recall — batch callers size both to the corpus via
    ``adaptive_hyperplane_params`` so candidates stay O(n).
    """

    def __init__(self, dim: int, num_bands: int = 48, rows_per_band: int = 8,
                 seed: int = 0xE5CA1A):
        rng = np.random.default_rng(seed)
        self.num_bands = num_bands
        self.rows_per_band = rows_per_band
        self.planes = rng.standard_normal((dim, num_bands * rows_per_band))

    def __call__(self, batch: pa.Table) -> pa.Table:
        mat = stack_embeddings(batch)  # sign of projection is norm-invariant
        ids = batch["vec_id"].to_numpy()
        n = len(ids)
        bits = (mat @ self.planes) > 0  # (n, B*r)
        codes = bits.reshape(n, self.num_bands, self.rows_per_band)
        powers = (1 << np.arange(self.rows_per_band)).astype(np.uint64)
        digest = (codes.astype(np.uint64) * powers[None, None, :]).sum(axis=2)
        band_idx = np.broadcast_to(
            np.arange(self.num_bands, dtype=np.int32), (n, self.num_bands)
        )
        return pa.table(
            {
                "band": pa.array(band_idx.ravel(), type=pa.int32()),
                "bucket": pa.array(digest.ravel(), type=pa.uint64()),
                "sbucket": pa.array(
                    ((digest.ravel() * np.uint64(2654435761)) & np.uint64(255)).astype(
                        np.int32
                    )
                ),
                "doc_id": pa.array(np.repeat(ids, self.num_bands), type=pa.int64()),
            }
        )


def embedding_blob_batch(batch: pa.Table) -> pa.Table:
    """(vec_id, emb: float64le blob) — the join side for exact verification
    (Arrow's hash join rejects list payload columns, same as shingles)."""
    mat = stack_embeddings(batch)
    ids = batch["vec_id"].to_numpy()
    return pa.table(
        {
            "vec_id": pa.array(ids, type=pa.int64()),
            "emb": pa.array([row.tobytes() for row in mat], type=pa.binary()),
        }
    )


def verify_cosine_pairs(batch: pa.Table, threshold: float) -> pa.Table:
    """Exact-cosine verify over joined pair rows carrying both embeddings
    (columns emb_a / emb_b); float64, rounded to 5 decimals — the same
    arithmetic as the oracle's list_cosine_similarity."""
    a_ids = batch["doc_a"].to_numpy()
    b_ids = batch["doc_b"].to_numpy()
    if len(a_ids) == 0:
        return pa.table(
            {
                "vec_a": pa.array([], type=pa.int64()),
                "vec_b": pa.array([], type=pa.int64()),
                "sim": pa.array([], type=pa.float64()),
            }
        )
    a = np.stack([np.frombuffer(x, dtype=np.float64) for x in batch["emb_a"].to_pylist()])
    b = np.stack([np.frombuffer(x, dtype=np.float64) for x in batch["emb_b"].to_pylist()])
    num = (a * b).sum(axis=1)
    den = np.sqrt((a * a).sum(axis=1)) * np.sqrt((b * b).sum(axis=1))
    den[den == 0] = 1.0
    sim = np.round(num / den, 5)
    keep = sim >= threshold
    return pa.table(
        {
            "vec_a": pa.array(a_ids[keep], type=pa.int64()),
            "vec_b": pa.array(b_ids[keep], type=pa.int64()),
            "sim": pa.array(sim[keep], type=pa.float64()),
        }
    )


def centroids_by_label(ds) -> tuple[np.ndarray, np.ndarray]:
    """(labels, centroid matrix) — grouped mean over the label column.
    Sums are accumulated per batch (partial aggregation) so only
    (n_labels x d) partials reach the driver."""
    import ray

    def partial_sums(batch: pa.Table) -> pa.Table:
        mat = stack_embeddings(batch)
        labels = batch["label"].to_numpy()
        uniq = np.unique(labels)
        sums = np.stack([mat[labels == u].sum(axis=0) for u in uniq])
        counts = np.array([(labels == u).sum() for u in uniq], dtype=np.int64)
        return pa.table(
            {
                "label": pa.array(uniq, type=pa.int32()),
                "sum": pa.array(list(sums), type=pa.list_(pa.float64())),
                "count": pa.array(counts, type=pa.int64()),
            }
        )

    parts = ds.map_batches(partial_sums, batch_format="pyarrow").to_pandas()
    agg: dict[int, tuple[np.ndarray, int]] = {}
    for _, row in parts.iterrows():
        s, c = agg.get(int(row["label"]), (0.0, 0))
        agg[int(row["label"])] = (s + np.asarray(row["sum"]), c + int(row["count"]))
    labels = np.array(sorted(agg), dtype=np.int64)
    cents = np.stack([agg[int(u)][0] / agg[int(u)][1] for u in labels])
    return labels, cents
