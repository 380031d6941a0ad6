"""sf1 training-operator panel (round-4 verdict ask #9).

The driver tables stop at sf0.1 (5k docs / 2k vectors), so this harness
synthesises a DETERMINISTIC sf1-scale fixture of exactly the driver shape
(documents: doc_id/text/lang/source/n_chars; embeddings:
vec_id/embedding list<float>[64]/label) at 10x sf0.1 — 50k docs, 20k
vectors — under ``/tmp/tcr_fixtures/training_<label>``, then times the
round-4/5 training additions on it at 32 CPUs.  No external data: the
generator is seeded numpy over the same closed vocabulary the driver
fixture uses, with a calibrated duplicate structure (1% exact copies +
2% near copies in clusters) so dedup / connected-components have real
work.  ``--label sf3`` scales to 150k docs / 60k vectors for the
connected-components regime comparison (driver union-find vs distributed
pointer jumping on the same pair set).

Usage:
    python scripts/training_panel.py [--label sf1] [--cpus 32]

Prints one JSON line: {"sf": ..., "n_docs": ..., "queries": {name: sec}}.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

FIXTURE_ROOT = "/tmp/tcr_fixtures"
TRAINING_FIXTURE_VERSION = 2

# the driver documents vocabulary (observed closed set, sf0.1)
VOCAB = np.array(
    "spark batch line column order small sort fast value scan hash slow group "
    "agg filter query big key window row part table stream merge data a the "
    "join vector customer".split()
)
LANGS = np.array(["en", "zh", "es", "fr", "de"])
LANG_P = np.array([0.41, 0.15, 0.15, 0.15, 0.14])

SCALES = {
    # 10x / 30x the sf0.1 driver tables
    "sf1": (50_000, 20_000),
    "sf3": (150_000, 60_000),
}


def _gen_documents(n_docs: int, rng: np.random.Generator) -> pa.Table:
    lens = rng.integers(7, 101, size=n_docs)
    flat = VOCAB[rng.integers(0, len(VOCAB), size=int(lens.sum()))]
    offs = np.zeros(n_docs + 1, dtype=np.int64)
    offs[1:] = np.cumsum(lens)
    texts = [" ".join(flat[offs[i] : offs[i + 1]]) for i in range(n_docs)]

    # duplicate structure: heads get clusters of exact (1%) and near (2%)
    # copies; near copies mutate 1-2 word positions so MinHash/SimHash see
    # genuine near-dups, not exacts
    n_exact = n_docs // 100
    n_near = n_docs // 50
    copy_pos = rng.choice(
        np.arange(n_docs // 10, n_docs), size=n_exact + n_near, replace=False
    )
    heads = rng.integers(0, n_docs // 10, size=n_exact + n_near)
    for j, (pos, head) in enumerate(zip(copy_pos, heads)):
        if j < n_exact:
            texts[pos] = texts[head]
        else:
            words = texts[head].split(" ")
            for slot in rng.integers(0, len(words), size=rng.integers(1, 3)):
                words[slot] = str(VOCAB[rng.integers(0, len(VOCAB))])
            texts[pos] = " ".join(words)

    lang = LANGS[rng.choice(len(LANGS), size=n_docs, p=LANG_P)]
    source = np.char.add("src", rng.integers(0, 20, size=n_docs).astype(str))
    t = pa.table(
        {
            "doc_id": pa.array(np.arange(n_docs), type=pa.int64()),
            "text": pa.array(texts, type=pa.string()),
            "lang": pa.array(lang, type=pa.string()),
            "source": pa.array(source, type=pa.string()),
        }
    )
    import pyarrow.compute as pc

    return t.append_column("n_chars", pc.cast(pc.utf8_length(t["text"]), pa.int64()))


def _gen_embeddings(n_vecs: int, rng: np.random.Generator, dim: int = 64) -> pa.Table:
    # WEAK cluster structure (centers small vs noise): the driver's own
    # embeddings table is near-orthogonal — a 3000-row sample has ZERO pairs
    # above 0.8 cosine — so the only near-dups must be the planted ones.
    # Tight clusters (v1 of this fixture) made every same-cluster pair a
    # "near-dup" and the pair set quadratic: pathological, not representative.
    k = 10
    centers = rng.normal(0, 0.3, size=(k, dim)).astype(np.float32)
    label = rng.integers(0, k, size=n_vecs).astype(np.int32)
    vecs = centers[label] + rng.normal(0, 1.0, size=(n_vecs, dim)).astype(np.float32)
    # near-dup structure mirroring the docs: 1% exact + 2% epsilon copies
    n_exact, n_near = n_vecs // 100, n_vecs // 50
    pos = rng.choice(np.arange(n_vecs // 10, n_vecs), size=n_exact + n_near, replace=False)
    head = rng.integers(0, n_vecs // 10, size=n_exact + n_near)
    vecs[pos[:n_exact]] = vecs[head[:n_exact]]
    vecs[pos[n_exact:]] = vecs[head[n_exact:]] + rng.normal(
        0, 1e-3, size=(n_near, dim)
    ).astype(np.float32)
    label[pos] = label[head]
    return pa.table(
        {
            "vec_id": pa.array(np.arange(n_vecs), type=pa.int64()),
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(vecs.ravel(), type=pa.float32()), dim
            ).cast(pa.list_(pa.float32())),
            "label": pa.array(label, type=pa.int32()),
        }
    )


def ensure_fixture(label: str) -> str:
    n_docs, n_vecs = SCALES[label]
    out_dir = os.path.join(
        FIXTURE_ROOT, f"training_{label}_v{TRAINING_FIXTURE_VERSION}"
    )
    done = os.path.join(out_dir, "_DONE")
    if os.path.exists(done):
        return out_dir
    os.makedirs(out_dir, exist_ok=True)
    rng = np.random.default_rng(0x7EA1)
    pq.write_table(_gen_documents(n_docs, rng), os.path.join(out_dir, "documents.parquet"))
    pq.write_table(_gen_embeddings(n_vecs, rng), os.path.join(out_dir, "embeddings.parquet"))
    with open(done, "w") as f:
        f.write("ok")
    return out_dir


PANEL = [
    # round-4 training additions (the ask-#9 list)
    "text_chunking",
    "text_packing",
    "sample_stratified_documents",
    "text_decontaminate",
    "text_repetition_scores",
    "dedup_connected_components",
    # context: the dedup family + export + ANN at the same tier
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "dedup_ngram_jaccard",
    "dedup_embedding_cosine",
    "sink_shard_export",
    "kmeans_train",
    "ann_cosine_topk",
    "ann_ivf_trained_topk",
]


def consume(res) -> int:
    import pandas as pd

    if hasattr(res, "count") and not hasattr(res, "columns"):
        return res.count()
    if hasattr(res, "to_pandas") and not isinstance(res, pd.DataFrame):
        return res.to_pandas().shape[0]
    return res.shape[0]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--label", default="sf1", choices=sorted(SCALES))
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("RAY_GRAFT_CPUS", "32")))
    ap.add_argument("--cc-compare", action="store_true",
                    help="additionally time connected components with the "
                    "driver union-find path disabled (pair_cap=0)")
    ap.add_argument("queries", nargs="*", help="subset of panel names")
    args = ap.parse_args()

    sf_dir = ensure_fixture(args.label)
    print(f"[panel] fixture at {sf_dir}", file=sys.stderr, flush=True)

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.cpus, include_dashboard=False,
                 logging_level="ERROR")
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    import __ray_entry__ as entry

    qs = entry.queries()
    names = args.queries or PANEL
    out: dict[str, float] = {}
    rows: dict[str, int] = {}
    for name in names:
        fn = qs.get(name)
        if fn is None:
            continue
        t0 = time.perf_counter()
        rows[name] = consume(fn(sf_dir))
        out[name] = round(time.perf_counter() - t0, 3)
        print(f"[panel] {name}: {out[name]} s ({rows[name]} rows)",
              file=sys.stderr, flush=True)

    if args.cc_compare:
        from tapdata_connectors_ray.pipelines.training import (
            q_dedup_connected_components,
        )

        t0 = time.perf_counter()
        rows["cc_distributed"] = consume(
            q_dedup_connected_components(sf_dir, pair_cap=0)
        )
        out["cc_distributed"] = round(time.perf_counter() - t0, 3)
        print(f"[panel] cc_distributed: {out['cc_distributed']} s",
              file=sys.stderr, flush=True)

    n_docs, n_vecs = SCALES[args.label]
    print(json.dumps({
        "metric": f"training panel {args.label}",
        "sf": args.label,
        "n_docs": n_docs,
        "n_vecs": n_vecs,
        "num_cpus": args.cpus,
        "queries": out,
        "rows": rows,
    }))
    ray.shutdown()


if __name__ == "__main__":
    main()
