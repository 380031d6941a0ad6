"""Training-data operator tests: dedup family, similarity search, text
analysis, multimodal plumbing.

Mirrors the driver gate: Ray pipeline vs DuckDB oracle on the sf0.001
driver tables (tiny), plus unit checks of the cross-system hash parity the
oracles depend on.
"""

from __future__ import annotations

import os

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest

SF = "/root/testdata/sf0.001"


def _oracle(sql: str) -> pd.DataFrame:
    con = duckdb.connect()
    for t in ("documents", "embeddings"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
    return con.execute(sql).fetchdf()


def _norm(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype.kind == "f":
            df[c] = df[c].round(6)
        if df[c].dtype.kind == "u":
            df[c] = df[c].astype("uint64")
    return df.sort_values(list(df.columns), ignore_index=True)


def _frames_equal(got, exp) -> bool:
    g, e = _norm(got), _norm(exp)
    if len(g) != len(e) or sorted(g.columns) != sorted(e.columns):
        return False
    return g.astype(str).equals(e.astype(str))


# -- hash / tokenizer parity -------------------------------------------------


def test_md5_lower64_matches_duckdb():
    from tapdata_connectors_ray.functions.texthash import md5_lower64

    con = duckdb.connect()
    for s in ("abc", "", "lorem ipsum", "conv-00000001"):
        expected = con.execute("SELECT md5_number_lower(?)", [s]).fetchone()[0]
        assert md5_lower64(s) == expected


def test_tokenizer_matches_duckdb_split():
    from tapdata_connectors_ray.functions.texthash import tokens

    con = duckdb.connect()
    for s in ("a  b c ", "", "one two"):
        expected = con.execute("SELECT string_split(lower(?), ' ')", [s]).fetchone()[0]
        assert tokens(s) == expected


def test_augment_docs_matches_sql_cte():
    import pyarrow.parquet as pq

    from tapdata_connectors_ray.pipelines.training import _AUG_CTE
    from tapdata_connectors_ray.stages.dedup import augment_docs

    raw = pq.read_table(f"{SF}/documents.parquet", columns=["doc_id", "text"])
    got = augment_docs(raw).to_pandas()
    exp = _oracle(_AUG_CTE + "SELECT doc_id, text FROM aug")
    assert _frames_equal(got, exp)


# -- dedup vs oracle ---------------------------------------------------------


@pytest.mark.parametrize(
    "qname",
    [
        "dedup_exact",
        "dedup_ngram_jaccard",
        "dedup_minhash_lsh",
        "dedup_simhash",
        "dedup_embedding_cosine",
        "ann_cosine_topk",
        "ann_ivf_topk",
        "text_token_counts",
        "text_quality_scores",
        "text_language_id",
        "text_fingerprint",
    ],
)
def test_query_matches_oracle(ray_session, qname):
    from tapdata_connectors_ray.pipelines.training import TRAINING_SQL, training_queries

    got = training_queries()[qname](SF)
    if hasattr(got, "to_pandas"):
        got = got.to_pandas()
    if qname == "text_fingerprint":  # rendered per-tier (series bound)
        from tapdata_connectors_ray.pipelines.training import _fingerprint_sql

        exp = _oracle(_fingerprint_sql(SF))
    else:
        exp = _oracle(TRAINING_SQL[qname])
    assert _frames_equal(got, exp), f"{qname}: got {len(got)} rows vs {len(exp)}"


def test_minhash_recall_is_total_at_threshold(ray_session):
    """LSH candidates must cover every true pair >= threshold (64x2 banding
    gives P[miss] < 1e-18 at j=0.8; the fixture's dup pairs are j>=0.8)."""
    from tapdata_connectors_ray.pipelines.training import (
        MINHASH_THRESHOLD,
        TRAINING_SQL,
        training_queries,
    )

    got = training_queries()["dedup_minhash_lsh"](SF).to_pandas()
    exp = _oracle(TRAINING_SQL["dedup_minhash_lsh"])
    assert set(map(tuple, got[["doc_a", "doc_b"]].to_numpy())) == set(
        map(tuple, exp[["doc_a", "doc_b"]].to_numpy())
    )


# -- multimodal --------------------------------------------------------------


def test_media_decode_roundtrip(ray_session):
    from tapdata_connectors_ray.pipelines.training import (
        q_multimodal_decode_features,
        q_multimodal_resize_pipeline,
    )

    feats = q_multimodal_decode_features(SF).to_pandas()
    assert set(feats["kind"]) == {"image", "audio", "video"}
    imgs = feats[feats["kind"] == "image"]
    assert ((imgs["dim_a"] >= 8) & (imgs["dim_a"] < 64)).all()
    assert imgs["mean_signal"].between(0, 255).all()

    resized = q_multimodal_resize_pipeline(SF).to_pandas()
    assert (resized["kind"] == "image").all()
    assert (resized["dim_a"] == 8).all() and (resized["dim_b"] == 8).all()


def test_decode_stub_gate():
    from tapdata_connectors_ray.sources.media import DecodeMedia

    with pytest.raises(NotImplementedError):
        DecodeMedia(require_real_codecs=True)


def test_simhash_chunk_banding_is_exact():
    """hamming<=3 over 4 chunks of 16 bits => some chunk equal (pigeonhole)."""
    from tapdata_connectors_ray.stages.dedup import SIMHASH_CHUNKS

    rng = np.random.default_rng(1)
    for _ in range(200):
        a = rng.integers(0, 2**63, dtype=np.uint64)
        flip_bits = rng.choice(64, size=3, replace=False)
        b = a
        for j in flip_bits:
            b = np.uint64(b) ^ (np.uint64(1) << np.uint64(j))
        shares = any(
            (int(a) >> (16 * c)) & 0xFFFF == (int(b) >> (16 * c)) & 0xFFFF
            for c in range(SIMHASH_CHUNKS)
        )
        assert shares


def test_dedup_exact_incremental_touches_only_affected_buckets(ray_session, tmp_path):
    """The incremental ledger's contract: epoch 2 rewrites ONLY the buckets
    its docs hash into — every other ledger file is byte-untouched (no
    corpus re-scan); and the final ledger equals the first-seen-wins
    brute force over both epochs."""
    import os

    import ray.data

    from tapdata_connectors_ray.pipelines.training import (
        _LEDGER_BUCKETS,
        ingest_dedup_epoch,
    )

    def docs(rows):
        return ray.data.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                    "text": pa.array([r[1] for r in rows], pa.string()),
                }
            )
        )

    ledger = str(tmp_path / "ledger")
    ep1 = [(10, "aa"), (11, "bb"), (12, "aa"), (13, "cc")]
    ep2 = [(1, "aa"), (2, "dd")]  # smaller doc_id must NOT steal "aa"
    ingest_dedup_epoch(docs(ep1), ledger)
    stamps = {
        f: os.stat(os.path.join(ledger, f)).st_mtime_ns for f in os.listdir(ledger)
    }
    ingest_dedup_epoch(docs(ep2), ledger)

    from tapdata_connectors_ray.stages.dedup import add_text_hash

    t = pa.table({"text": pa.array(["aa", "dd"], pa.string()), "doc_id": [0, 0]})
    touched = {
        f"bucket-{b:04d}.parquet"
        for b in (
            add_text_hash(t)["text_hash"].to_numpy().view(np.uint64)
            % np.uint64(_LEDGER_BUCKETS)
        ).astype(int)
    }
    for f, old in stamps.items():
        now = os.stat(os.path.join(ledger, f)).st_mtime_ns
        if f in touched:
            assert now != old, f"{f} should have been rewritten"
        else:
            assert now == old, f"{f} rewritten without epoch-2 docs"

    final = (
        ray.data.read_parquet(ledger)
        .to_pandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    got = dict(zip(final["doc_id"], final["n_copies"]))
    assert got == {10: 3, 11: 1, 13: 1, 2: 1}  # "aa": ep1 winner 10, 3 copies


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.data_too_large],
)
@given(data=st.data())
def test_dedup_ledger_matches_first_seen_bruteforce(ray_session, tmp_path_factory, data):
    """Arbitrary docs split into arbitrary ordered epochs: the ledger's
    final state equals a sequential first-seen-wins fold."""
    import ray.data

    from tapdata_connectors_ray.pipelines.training import ingest_dedup_epoch

    n = data.draw(st.integers(1, 25))
    rows = [
        (i, data.draw(st.sampled_from(["t0", "t1", "t2", "t3"])))
        for i in range(n)
    ]
    n_epochs = data.draw(st.integers(1, 3))
    assignment = [data.draw(st.integers(0, n_epochs - 1)) for _ in range(n)]

    ledger = str(tmp_path_factory.mktemp("ledger_prop") / "ledger")
    for ep in range(n_epochs):
        sub = [r for r, a in zip(rows, assignment) if a == ep]
        if not sub:
            continue
        ingest_dedup_epoch(
            ray.data.from_arrow(
                pa.table(
                    {
                        "doc_id": pa.array([r[0] for r in sub], pa.int64()),
                        "text": pa.array([r[1] for r in sub], pa.string()),
                    }
                )
            ),
            ledger,
        )

    exp: dict[str, list[int]] = {}
    for ep in range(n_epochs):
        for r, a in zip(rows, assignment):
            if a == ep:
                exp.setdefault(r[1], [ep, r[0], 0])
                if exp[r[1]][0] == ep:
                    exp[r[1]][1] = min(exp[r[1]][1], r[0])
                exp[r[1]][2] += 1
    want = {v[1]: v[2] for v in exp.values()}

    import ray.data as rd

    final = rd.read_parquet(ledger).to_pandas()
    got = dict(zip(final["doc_id"].astype(int), final["n_copies"].astype(int)))
    assert got == want


def test_lsh_ledger_three_epochs_cross_joiners(ray_session, tmp_path):
    """The incremental LSH ledger across 3 epochs: a near-dup rep pair found
    in epoch 1 must expand over BOTH clusters' later joiners — including the
    joiner×joiner cross pair arriving simultaneously in epoch 2 (the case a
    member-level inheritance misses)."""
    import ray.data

    from tapdata_connectors_ray.pipelines.training import ingest_lsh_epoch

    words = [f"w{i}" for i in range(12)]
    X = " ".join(words)          # 10 3-grams
    Xp = " ".join(words[:10])    # 8 3-grams, all shared -> j = 0.8

    def docs(rows):
        return ray.data.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                    "text": pa.array([r[1] for r in rows], pa.string()),
                }
            )
        )

    ledger = str(tmp_path / "lsh")
    ingest_lsh_epoch(docs([(1, X)]), ledger, epoch=0)
    ingest_lsh_epoch(docs([(2, Xp)]), ledger, epoch=1)
    ingest_lsh_epoch(docs([(3, X), (4, Xp)]), ledger, epoch=2)

    got = (
        ray.data.read_parquet(f"{ledger}/pairs")
        .to_pandas()
        .sort_values(["doc_a", "doc_b"])
        .reset_index(drop=True)
    )
    pairs = {
        (int(a), int(b)): (int(c), int(u))
        for a, b, c, u in zip(got.doc_a, got.doc_b, got.common, got.union_n)
    }
    assert pairs == {
        (1, 2): (8, 10),
        (1, 3): (10, 10),
        (1, 4): (8, 10),
        (2, 3): (8, 10),
        (2, 4): (8, 8),
        (3, 4): (8, 10),  # joiner x joiner across the two clusters
    }


@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.data_too_large],
)
@given(data=st.data())
def test_lsh_ledger_union_equals_batch_on_random_splits(
    ray_session, tmp_path_factory, data
):
    """The incremental LSH union-determinism argument, randomized: for an
    ARBITRARY corpus (exact copies, truncated near-dups, distinct texts)
    split into ARBITRARY ordered epochs, the union of per-epoch ledger
    outputs equals the single-shot ledger run over everything."""
    import ray.data

    from tapdata_connectors_ray.pipelines.training import ingest_lsh_epoch

    base_words = [f"w{i}" for i in range(14)]
    texts = []
    n_base = data.draw(st.integers(1, 4))
    for i in range(n_base):
        words = [f"{w}x{i}" for w in base_words]
        texts.append(" ".join(words))           # base text
        texts.append(" ".join(words[:12]))      # near-dup (12/10 grams)
    docs = []
    n = data.draw(st.integers(2, 12))
    for d in range(n):
        docs.append((d, data.draw(st.sampled_from(texts))))

    def ds(rows):
        return ray.data.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                    "text": pa.array([r[1] for r in rows], pa.string()),
                }
            )
        )

    n_epochs = data.draw(st.integers(1, 3))
    assignment = [data.draw(st.integers(0, n_epochs - 1)) for _ in range(n)]

    def run(split: bool) -> set:
        ledger = str(tmp_path_factory.mktemp("lsh_prop") / "ledger")
        if split:
            for ep in range(n_epochs):
                sub = [r for r, a in zip(docs, assignment) if a == ep]
                if sub:
                    ingest_lsh_epoch(ds(sub), ledger, epoch=ep)
        else:
            ingest_lsh_epoch(ds(docs), ledger, epoch=0)
        import os

        pairs_dir = os.path.join(ledger, "pairs")
        if not any(os.scandir(pairs_dir)):
            return set()
        got = ray.data.read_parquet(pairs_dir).to_pandas()
        return {
            (int(a), int(b), int(c), int(u))
            for a, b, c, u in zip(got.doc_a, got.doc_b, got.common, got.union_n)
        }

    assert run(split=True) == run(split=False)


def test_embedding_and_simhash_ledgers_two_epochs(ray_session, tmp_path):
    """Cross-epoch pair discovery for the embedding and SimHash ledgers: a
    second-epoch vector/doc must pair with first-epoch entries via the
    stored band/chunk buckets only."""
    import ray.data

    from tapdata_connectors_ray.pipelines.training import (
        ingest_embedding_epoch,
        ingest_simhash_epoch,
    )

    # embeddings: v2 == v1 (exact copy), v3 orthogonal
    dim = 16
    base = np.zeros(dim); base[0] = 1.0
    orth = np.zeros(dim); orth[1] = 1.0

    def eds(rows):
        return ray.data.from_arrow(
            pa.table(
                {
                    "vec_id": pa.array([r[0] for r in rows], pa.int64()),
                    "embedding": pa.array(
                        [r[1].astype(np.float32) for r in rows],
                        pa.list_(pa.float32()),
                    ),
                }
            )
        )

    led = str(tmp_path / "emb")
    ingest_embedding_epoch(eds([(1, base), (3, orth)]), led, epoch=0, dim=dim)
    ingest_embedding_epoch(eds([(2, base)]), led, epoch=1, dim=dim)
    got = ray.data.read_parquet(f"{led}/pairs").to_pandas()
    assert set(zip(got.vec_a, got.vec_b)) == {(1, 2)}
    assert float(got.sim.iloc[0]) == 1.0

    # simhash: identical texts across epochs -> hamming 0 pair
    def dds(rows):
        return ray.data.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                    "text": pa.array([r[1] for r in rows], pa.string()),
                }
            )
        )

    words = " ".join(f"tok{i}" for i in range(30))
    led2 = str(tmp_path / "sh")
    ingest_simhash_epoch(dds([(1, words)]), led2, epoch=0)
    ingest_simhash_epoch(dds([(2, words)]), led2, epoch=1)
    got2 = ray.data.read_parquet(f"{led2}/pairs").to_pandas()
    assert set(zip(got2.doc_a, got2.doc_b)) == {(1, 2)}
    assert int(got2.hamming.iloc[0]) == 0


def test_band_ledger_fold_retry_idempotent(tmp_path):
    """A re-executed band-ledger fold task (same epoch) must NOT
    double-append the bucket file, and must reproduce its candidate output
    exactly — the last_epoch stamp-and-skip guard."""
    import pandas as pd
    import pyarrow.parquet as pq

    from tapdata_connectors_ray.pipelines.training import make_band_ledger_fold

    d = str(tmp_path)
    df1 = pd.DataFrame(
        {
            "sbucket": np.int32([7, 7]),
            "band": np.int32([0, 1]),
            "bucket": np.uint64([11, 22]),
            "doc_id": np.int64([1, 1]),
        }
    )
    fold1 = make_band_ledger_fold(d, epoch=1)
    out1 = fold1(df1.copy())
    path = f"{d}/bucket-0007.parquet"
    rows_after_1 = pq.read_table(path).num_rows
    # simulated Ray task retry: identical group, same epoch
    out1_retry = fold1(df1.copy())
    assert pq.read_table(path).num_rows == rows_after_1, "retry double-appended"
    pd.testing.assert_frame_equal(
        out1.reset_index(drop=True), out1_retry.reset_index(drop=True)
    )
    # next epoch: doc 2 collides with doc 1 on (band=0, bucket=11)
    df2 = pd.DataFrame(
        {
            "sbucket": np.int32([7]),
            "band": np.int32([0]),
            "bucket": np.uint64([11]),
            "doc_id": np.int64([2]),
        }
    )
    fold2 = make_band_ledger_fold(d, epoch=2)
    out2 = fold2(df2.copy())
    assert set(zip(out2.doc_a, out2.doc_b)) == {(1, 2)}
    assert pq.read_table(path).num_rows == rows_after_1 + 1
    # and ITS retry reproduces the cross-epoch pair without re-appending
    out2_retry = fold2(df2.copy())
    assert set(zip(out2_retry.doc_a, out2_retry.doc_b)) == {(1, 2)}
    assert pq.read_table(path).num_rows == rows_after_1 + 1


def test_simhash_epoch_retry_idempotent(ray_session, tmp_path):
    """Re-running a whole SimHash epoch fold (the lost-block retry case)
    leaves the chunk ledger unchanged and the pair output identical."""
    import pyarrow.parquet as pq
    import ray.data

    from tapdata_connectors_ray.pipelines.training import ingest_simhash_epoch

    def dds(rows):
        return ray.data.from_arrow(
            pa.table(
                {
                    "doc_id": pa.array([r[0] for r in rows], pa.int64()),
                    "text": pa.array([r[1] for r in rows], pa.string()),
                }
            )
        )

    words = " ".join(f"tok{i}" for i in range(30))
    led = str(tmp_path / "sh")
    ingest_simhash_epoch(dds([(1, words)]), led, epoch=0)
    ingest_simhash_epoch(dds([(2, words)]), led, epoch=1)
    sizes = {
        f.name: pq.read_table(f.path).num_rows
        for f in os.scandir(f"{led}/chunks")
    }
    ingest_simhash_epoch(dds([(2, words)]), led, epoch=1)  # retry of epoch 1
    sizes2 = {
        f.name: pq.read_table(f.path).num_rows
        for f in os.scandir(f"{led}/chunks")
    }
    assert sizes2 == sizes, "retried epoch re-appended chunk rows"
    got = ray.data.read_parquet(f"{led}/pairs").to_pandas()
    assert set(zip(got.doc_a, got.doc_b)) == {(1, 2)}


def test_kmeans_fit_matches_sequential_reference(ray_session, tmp_path):
    """The distributed Lloyd fit (per-block partial sums folded on the
    driver) must equal a sequential numpy reference bit-for-bit in
    assignment and near-exactly in centroids, across several seeds."""
    import pyarrow.parquet as pq

    from tapdata_connectors_ray.pipelines.training import (
        KMEANS_ITERS,
        KMEANS_K,
        _kmeans_fit,
    )

    rng = np.random.default_rng(7)
    for trial in range(3):
        n, d = rng.integers(30, 200), 8
        mat = rng.normal(size=(n, d)).astype(np.float32)
        ids = rng.permutation(1000)[:n].astype(np.int64)
        sf = str(tmp_path / f"t{trial}")
        import os as _os

        _os.makedirs(sf, exist_ok=True)
        pq.write_table(
            pa.table(
                {
                    "vec_id": pa.array(ids),
                    "embedding": pa.array(list(mat), pa.list_(pa.float32())),
                }
            ),
            f"{sf}/embeddings.parquet",
        )
        labels, cents, counts = _kmeans_fit(sf)

        # sequential reference
        order = np.argsort(ids)
        m64 = mat.astype(np.float64)
        ref_c = m64[order[:KMEANS_K]]
        ref_l = np.arange(min(KMEANS_K, n), dtype=np.int64)
        for _ in range(KMEANS_ITERS):
            d2 = ((m64[:, None, :] - ref_c[None, :, :]) ** 2).sum(-1)
            a = d2.argmin(1)
            alive = np.unique(a)
            ref_c = np.stack([m64[a == j].mean(axis=0) for j in alive])
            ref_l = ref_l[alive]
            last = {int(ref_l[i]): int((a == alive[i]).sum()) for i in range(len(alive))}
        assert labels.tolist() == ref_l.tolist()
        assert {int(k): int(v) for k, v in counts.items()} == last
        np.testing.assert_allclose(cents, ref_c, rtol=0, atol=1e-9)


def test_packing_matches_bruteforce(ray_session, tmp_path):
    """Concatenate-then-slice packing vs a sequential brute force on random
    little corpora (exercises the distributed prefix-sum's block-head
    offset-resolution assumption across several doc-count/length mixes)."""
    import pyarrow.parquet as pq

    from tapdata_connectors_ray.pipelines.training import training_queries
    from tapdata_connectors_ray.stages.textqc import CHUNK_TOKENS

    rng = np.random.default_rng(11)
    q = training_queries()["text_packing"]
    for trial in range(3):
        n_docs = int(rng.integers(5, 120))
        texts = [
            " ".join(f"w{j}" for j in range(int(rng.integers(1, 200))))
            for _ in range(n_docs)
        ]
        ids = sorted(rng.permutation(10_000)[:n_docs].tolist())
        sf = str(tmp_path / f"p{trial}")
        os.makedirs(sf, exist_ok=True)
        pq.write_table(
            pa.table({"doc_id": pa.array(ids, pa.int64()), "text": pa.array(texts)}),
            f"{sf}/documents.parquet",
        )
        got = (
            q(sf).to_pandas().sort_values("seq_id").reset_index(drop=True)
        )
        # brute force: one concatenated token stream in doc_id order
        W = CHUNK_TOKENS
        exp: dict[int, list] = {}
        pos = 0
        for d, t in zip(ids, texts):
            n = len(t.lower().split(" "))
            for s in range(pos // W, (pos + n - 1) // W + 1):
                lo, hi = max(pos, s * W), min(pos + n, (s + 1) * W)
                e = exp.setdefault(s, [0, 0])
                e[0] += 1
                e[1] += hi - lo
            pos += n
        assert got["seq_id"].tolist() == sorted(exp)
        assert got["n_docs"].tolist() == [exp[s][0] for s in sorted(exp)]
        assert got["n_tokens"].tolist() == [exp[s][1] for s in sorted(exp)]


# -- repetition / decontamination / connected components ----------------------


def test_repetition_and_decontaminate_match_oracle(ray_session):
    from tapdata_connectors_ray.pipelines.training import (
        _decontaminate_sql,
        _repetition_sql,
        q_text_decontaminate,
        q_text_repetition_scores,
    )

    got = q_text_repetition_scores(SF).to_pandas()
    assert _frames_equal(got, _oracle(_repetition_sql(SF)))
    got = q_text_decontaminate(SF).to_pandas()
    exp = _oracle(_decontaminate_sql(SF))
    assert _frames_equal(got, exp)
    assert exp["contaminated"].sum() > 0  # the fixture must exercise both classes
    assert (exp["contaminated"] == 0).any()


def test_connected_components_matches_oracle(ray_session):
    from tapdata_connectors_ray.pipelines.training import (
        TRAINING_SQL,
        q_dedup_connected_components,
    )

    got = q_dedup_connected_components(SF).to_pandas()
    exp = _oracle(TRAINING_SQL["dedup_connected_components"])
    assert _frames_equal(got, exp)
    assert (exp["csize"] >= 2).all()  # every node in the pair graph has a peer


def test_vocab_incremental_equals_batch_both_modes(ray_session):
    """Additive DF ledger fold == one-shot vocabulary in BOTH hash modes."""
    from tapdata_connectors_ray.pipelines.training import (
        q_vocab_top_df,
        q_vocab_top_df_incremental,
    )

    for mode in ("oracle", "engine"):
        inc = q_vocab_top_df_incremental(SF, hash_mode=mode)
        batch = q_vocab_top_df(SF, hash_mode=mode)
        pd.testing.assert_frame_equal(
            inc.reset_index(drop=True), batch.reset_index(drop=True)
        )


def test_cc_incremental_resumes_from_ledger(ray_session, tmp_path):
    """Crash-resume: fold epochs 0-1 with a label ledger, then a FRESH call
    resumes at epoch 2 from the committed labels — result equals the
    uninterrupted fold and the batch CC."""
    from tapdata_connectors_ray.pipelines.training import (
        CC_INC_EPOCHS,
        q_dedup_cc_incremental,
        q_dedup_connected_components,
    )

    led = str(tmp_path / "cc_ledger")
    # run only epochs 0..n-2 (simulated crash before the last epoch); the
    # epoch-split modulus stays n_epochs so resume sees the same slices
    partial = q_dedup_cc_incremental(
        SF, ledger_dir=led, end_epoch=CC_INC_EPOCHS - 1
    ).to_pandas()
    assert len(partial)  # epochs committed
    resumed = q_dedup_cc_incremental(
        SF, ledger_dir=led, start_epoch=CC_INC_EPOCHS - 1
    ).to_pandas()
    batch = q_dedup_connected_components(SF).to_pandas()
    assert _frames_equal(resumed, batch)


def test_cc_incremental_equals_batch(ray_session):
    """Epoch-folded label ledger == one-shot CC on the full pair graph
    (incremental == batch, the module's ledger invariant)."""
    from tapdata_connectors_ray.pipelines.training import (
        q_dedup_cc_incremental,
        q_dedup_connected_components,
    )

    inc = q_dedup_cc_incremental(SF).to_pandas()
    batch = q_dedup_connected_components(SF).to_pandas()
    assert _frames_equal(inc, batch)


@given(st.data())
@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
def test_cc_label_edge_fold_matches_batch_on_random_graphs(ray_session, data):
    """The incremental trick — previous labels re-enter the next fold as
    compressed (id, label) edges — must equal batch CC for ANY epoch split
    of a random graph."""
    import ray.data

    from tapdata_connectors_ray.stages.dedup import connected_components

    n_nodes = data.draw(st.integers(min_value=2, max_value=25))
    edges = data.draw(
        st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=n_nodes - 1),
                st.integers(min_value=0, max_value=n_nodes - 1),
            ).filter(lambda p: p[0] != p[1]),
            min_size=1,
            max_size=30,
        )
    )
    n_epochs = data.draw(st.integers(min_value=2, max_value=4))
    assign = [data.draw(st.integers(min_value=0, max_value=n_epochs - 1)) for _ in edges]

    def tbl(es):
        return pa.table(
            {
                "doc_a": pa.array([min(e) for e in es], type=pa.int64()),
                "doc_b": pa.array([max(e) for e in es], type=pa.int64()),
            }
        )

    labels = None
    for ep in range(n_epochs):
        es = [e for e, a in zip(edges, assign) if a == ep]
        rows = tbl(es) if es else tbl([])
        eds = ray.data.from_arrow(rows)
        if labels is not None:
            led = labels.to_pandas()
            eds = eds.union(
                ray.data.from_arrow(
                    pa.table(
                        {
                            "doc_a": pa.array(led["id"].to_numpy(), type=pa.int64()),
                            "doc_b": pa.array(led["label"].to_numpy(), type=pa.int64()),
                        }
                    )
                )
            )
        if eds.count() == 0:
            continue
        labels = connected_components(eds.materialize(), num_partitions=2).materialize()

    batch = (
        connected_components(ray.data.from_arrow(tbl(edges)), num_partitions=2)
        .to_pandas()
        .set_index("id")["label"]
        .to_dict()
    )
    got = labels.to_pandas().set_index("id")["label"].to_dict()
    assert got == batch  # same node universe, same min-labels


def test_ann_filtered_topk_respects_predicate(ray_session):
    """Filtered vector search: oracle MATCH and every returned neighbor's
    label passes the pushed-down predicate."""
    from tapdata_connectors_ray.pipelines.training import (
        ANN_FILTER_LABELS,
        TRAINING_SQL,
        q_ann_filtered_topk,
    )

    got = q_ann_filtered_topk(SF)
    exp = _oracle(TRAINING_SQL["ann_filtered_topk"])
    assert _frames_equal(got, exp)

    import pyarrow.parquet as _pq

    t = _pq.read_table(SF + "/embeddings.parquet", columns=["vec_id", "label"])
    lab = dict(zip(t["vec_id"].to_pylist(), t["label"].to_pylist()))
    assert all(lab[n] in ANN_FILTER_LABELS for n in got["neighbor_id"])


def test_search_hybrid_rrf_matches_oracle_and_fusion_identity(ray_session):
    """Hybrid RRF: oracle MATCH, every fused row carries at least one list
    membership, and each RRF value equals the two-term reciprocal sum of
    its own rank columns."""
    from tapdata_connectors_ray.pipelines.training import (
        RRF_K,
        TRAINING_SQL,
        q_search_hybrid_rrf,
    )

    got = q_search_hybrid_rrf(SF)
    exp = _oracle(TRAINING_SQL["search_hybrid_rrf"])
    assert _frames_equal(got, exp)
    assert ((got["kw_rank"] > 0) | (got["vec_rank"] > 0)).all()
    recomputed = got.apply(
        lambda r: round(
            (1.0 / (RRF_K + r["kw_rank"]) if r["kw_rank"] else 0.0)
            + (1.0 / (RRF_K + r["vec_rank"]) if r["vec_rank"] else 0.0),
            6,
        ),
        axis=1,
    )
    assert (recomputed == got["rrf"]).all()


def test_embedding_outliers_matches_oracle_and_bruteforce(ray_session):
    """Top-N centroid-distance outliers: oracle MATCH plus a direct numpy
    recomputation (per-label mean centroid, rounded euclidean, lexsorted)."""
    from tapdata_connectors_ray.pipelines.training import (
        EMB_OUTLIER_TOP,
        TRAINING_SQL,
        q_embedding_outliers,
    )

    got = q_embedding_outliers(SF)
    exp = _oracle(TRAINING_SQL["embedding_outliers"])
    assert _frames_equal(got, exp)

    import pyarrow.parquet as _pq

    t = _pq.read_table(SF + "/embeddings.parquet")
    mat = np.stack(t["embedding"].to_pandas().to_numpy()).astype(np.float64)
    labels = t["label"].to_numpy().astype(np.int64)
    ids = t["vec_id"].to_numpy().astype(np.int64)
    cents = {l: mat[labels == l].mean(axis=0) for l in np.unique(labels)}
    dist = np.round(
        np.sqrt(((mat - np.stack([cents[l] for l in labels])) ** 2).sum(axis=1)), 5
    )
    order = np.lexsort((ids, -dist))[:EMB_OUTLIER_TOP]
    brute = pd.DataFrame(
        {"vec_id": ids[order], "label": labels[order], "dist": dist[order]}
    )
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True).astype({"vec_id": "int64", "label": "int64"}),
        brute.reset_index(drop=True),
    )


def test_relevance_topk_matches_oracle_and_bruteforce(ray_session):
    """Corpus-weighted keyword ranking: oracle MATCH plus a direct pandas
    recomputation of score = sum_t tf(t,d) * (N - df(t) + 1)."""
    from tapdata_connectors_ray.pipelines.training import (
        RELEVANCE_TERMS,
        RELEVANCE_TOP,
        TRAINING_SQL,
        q_text_relevance_topk,
    )

    got = q_text_relevance_topk(SF)
    exp = _oracle(TRAINING_SQL["text_relevance_topk"])
    assert _frames_equal(got, exp)

    import pyarrow.parquet as _pq

    t = _pq.read_table(SF + "/documents.parquet", columns=["doc_id", "text"])
    docs = t.to_pandas()
    n = len(docs)
    toks = docs.assign(tok=docs["text"].str.lower().str.split(" ")).explode("tok")
    toks = toks[toks["tok"].isin(RELEVANCE_TERMS)]
    df = toks.drop_duplicates(["doc_id", "tok"])["tok"].value_counts()
    toks = toks.assign(w=toks["tok"].map(lambda x: n - int(df[x]) + 1))
    brute = (
        toks.groupby("doc_id")["w"]
        .sum()
        .reset_index(name="score")
        .sort_values(["score", "doc_id"], ascending=[False, True])
        .head(RELEVANCE_TOP)
        .reset_index(drop=True)
    )
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True).astype("int64"), brute.astype("int64")
    )


def test_cluster_representatives_matches_oracle(ray_session):
    """Survivor selection = one row per component (singletons included),
    representative is the longest text (ties -> lowest doc_id), and the
    representative of every multi-doc cluster belongs to that cluster."""
    from tapdata_connectors_ray.pipelines.training import (
        TRAINING_SQL,
        q_dedup_cluster_representatives,
    )

    got = q_dedup_cluster_representatives(SF).to_pandas()
    exp = _oracle(TRAINING_SQL["dedup_cluster_representatives"])
    assert _frames_equal(got, exp)
    # one survivor per component; survivor count == total docs - dup excess
    assert got["component"].is_unique
    cc = _oracle(TRAINING_SQL["dedup_connected_components"])
    # augmented-corpus size: originals + verbatim copies (%5==0) + truncations (%5==1)
    n = _oracle(
        "SELECT count(*) AS n, "
        "sum(CASE WHEN doc_id % 5 = 0 THEN 1 ELSE 0 END) AS n0, "
        "sum(CASE WHEN doc_id % 5 = 1 THEN 1 ELSE 0 END) AS n1 FROM documents"
    )
    n_aug = int(n["n"][0] + n["n0"][0] + n["n1"][0])
    assert len(got) == n_aug - (len(cc) - cc["component"].nunique())
    # multi-doc clusters: representative must be a member
    multi = got[got["csize"] > 1]
    members = cc.groupby("component")["doc_id"].apply(set)
    for comp_id, keep in zip(multi["component"], multi["keep_doc_id"]):
        assert keep in members[comp_id]


@given(st.data())
@settings(max_examples=20, deadline=None, suppress_health_check=list(HealthCheck))
def test_repetition_kernel_matches_bruteforce(data):
    import collections

    from tapdata_connectors_ray.stages.textqc import (
        REP_DUP_TRIGRAM_MAX,
        REP_TOP_BIGRAM_MAX,
        repetition_scores_batch,
    )

    vocab = ["a", "b", "c", "dd"]
    texts = data.draw(
        st.lists(
            st.lists(st.sampled_from(vocab), min_size=1, max_size=12).map(" ".join),
            min_size=1,
            max_size=8,
        )
    )
    batch = pa.table(
        {"doc_id": pa.array(range(len(texts)), type=pa.int64()), "text": texts}
    )
    out = repetition_scores_batch(batch).to_pandas()
    for i, t in enumerate(texts):
        tk = t.lower().split(" ")
        bg = collections.Counter(zip(tk, tk[1:]))
        tg = collections.Counter(zip(tk, tk[1:], tk[2:]))
        top_bi = max(bg.values()) / (len(tk) - 1) if len(tk) > 1 else 0.0
        dup_tri = (
            sum(c for c in tg.values() if c >= 2) / (len(tk) - 2)
            if len(tk) > 2
            else 0.0
        )
        row = out.iloc[i]
        assert row["top_bigram_frac"] == top_bi
        assert row["dup_trigram_frac"] == dup_tri
        assert row["keep"] == int(
            top_bi <= REP_TOP_BIGRAM_MAX and dup_tri <= REP_DUP_TRIGRAM_MAX
        )


@given(st.data())
@settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
def test_decontaminate_kernel_matches_bruteforce(ray_session, data):
    import ray

    from tapdata_connectors_ray.stages.textqc import (
        DECONTAM_NGRAM,
        EVAL_HOLDOUT_MOD,
        eval_gram_partials,
        make_decontaminate,
    )

    vocab = ["a", "b", "c"]
    n_docs = data.draw(st.integers(min_value=2, max_value=12))
    texts = [
        data.draw(st.lists(st.sampled_from(vocab), min_size=1, max_size=9).map(" ".join))
        for _ in range(n_docs)
    ]
    # spread ids so some (multiples of the holdout mod) land in the eval set
    ids = [i * (EVAL_HOLDOUT_MOD // 2) for i in range(n_docs)]
    batch = pa.table({"doc_id": pa.array(ids, type=pa.int64()), "text": texts})

    def grams(t):
        tk = t.lower().split(" ")
        k = DECONTAM_NGRAM
        return {" ".join(tk[i : i + k]) for i in range(len(tk) - k + 1)}

    ev_grams = set().union(
        *(grams(t) for i, t in zip(ids, texts) if i % EVAL_HOLDOUT_MOD == 0), set()
    )
    ev = np.unique(eval_gram_partials(batch)["gh"].to_numpy())
    out = make_decontaminate(ray.put(ev))(batch).to_pandas().set_index("doc_id")
    for i, t in zip(ids, texts):
        if i % EVAL_HOLDOUT_MOD == 0:
            assert i not in out.index
        else:
            assert out.loc[i, "n_shared"] == len(grams(t) & ev_grams)


@given(st.data())
@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
def test_connected_components_matches_union_find(ray_session, data):
    import ray.data

    from tapdata_connectors_ray.stages.dedup import connected_components

    n_nodes = data.draw(st.integers(min_value=2, max_value=30))
    edges = data.draw(
        st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=n_nodes - 1),
                st.integers(min_value=0, max_value=n_nodes - 1),
            ).filter(lambda p: p[0] != p[1]),
            min_size=1,
            max_size=40,
        )
    )
    pairs = pa.table(
        {
            "doc_a": pa.array([min(e) for e in edges], type=pa.int64()),
            "doc_b": pa.array([max(e) for e in edges], type=pa.int64()),
        }
    )
    # pair_cap=0 forces the distributed hash-min loop; the default regime
    # (driver union-find) must agree bit-for-bit
    got = (
        connected_components(ray.data.from_arrow(pairs), num_partitions=2, pair_cap=0)
        .to_pandas()
        .set_index("id")["label"]
        .to_dict()
    )
    got_driver = (
        connected_components(ray.data.from_arrow(pairs), num_partitions=2)
        .to_pandas()
        .set_index("id")["label"]
        .to_dict()
    )
    assert got == got_driver
    # brute force union-find
    parent = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    exp = {}
    for a, b in edges:
        exp[a] = find(a)
        exp[b] = find(b)
    # normalize union-find roots to min member per component
    comp_min = {}
    for node, root in exp.items():
        comp_min[root] = min(comp_min.get(root, node), node)
    exp = {node: comp_min[root] for node, root in exp.items()}
    assert got == exp


def test_shard_export_matches_oracle_and_layout(ray_session):
    import os
    import tempfile

    from tapdata_connectors_ray.pipelines.training import (
        SHARD_EXPORT_N,
        TRAINING_SQL,
        q_sink_shard_export,
    )

    got = q_sink_shard_export(SF).to_pandas()
    exp = _oracle(TRAINING_SQL["sink_shard_export"])
    assert _frames_equal(got, exp)
    root = os.path.join(tempfile.gettempdir(), f"tcr_shard_export_{os.getpid()}")
    dirs = sorted(os.listdir(root))
    assert all(d.startswith("shard=") for d in dirs)
    assert len(dirs) == len(exp) <= SHARD_EXPORT_N


def test_curation_incremental_matches_oracle_and_batch_winner_rule(ray_session):
    """The epoch-ledgered curation chain must match its composed SQL twin,
    and must differ from the batch chain exactly where the semantics say:
    first-seen-wins winners (not global-min) and the MinHash threshold
    (0.8 full-gram, not the 0.6 cutoff-gram batch rule)."""
    from tapdata_connectors_ray.pipelines.training import (
        TRAINING_SQL,
        q_curation_incremental,
        q_curation_pipeline,
    )

    got = q_curation_incremental(SF).to_pandas()
    exp = _oracle(TRAINING_SQL["curation_incremental"])
    assert _frames_equal(got, exp)
    batch = q_curation_pipeline(SF).to_pandas()
    # the higher near-dup threshold can only drop FEWER docs
    assert len(got) >= len(batch)


def test_adaptive_hyperplane_params_scale_and_recall():
    """Band geometry must (a) keep the DRIVER tiers at the historical
    (48, 8) so oracle behavior is bit-stable where it was already verified,
    (b) grow rows_per_band ~log2(n) so expected false candidates stay O(n)
    rather than O(n^2), and (c) always honor the recall bound that makes
    LSH+exact-verify equal brute force."""
    import math

    from tapdata_connectors_ray.stages.similarity import adaptive_hyperplane_params

    p_bit = 1.0 - math.acos(0.9) / math.pi

    # (a) driver tiers (augmented corpus 240 / 2400 rows): unchanged knobs
    assert adaptive_hyperplane_params(240) == (48, 8)

    prev_rate = None
    for n in (240, 2_400, 24_000, 240_000, 2_400_000, 24_000_000):
        bands, r = adaptive_hyperplane_params(n)
        # (c) recall: miss probability for a pair AT the threshold
        miss = (1.0 - p_bit**r) ** bands
        assert miss <= 1e-7 * (1 + 1e-9), (n, bands, r, miss)
        # (b) false-candidate volume stays O(n): pairs/vector bounded
        false_per_vec = (n / 2) * bands * 0.5**r
        assert false_per_vec <= 129.0, (n, bands, r, false_per_vec)
        rate = false_per_vec / n
        if prev_rate is not None:
            assert rate <= prev_rate * 1.05  # no quadratic creep
        prev_rate = rate


def test_shuffle_epoch_order_engine_mode_and_seed_independence(ray_session):
    """The epoch reshuffle must be a valid deterministic order in BOTH hash
    modes: epoch_rank a permutation of 1..n, shard a contiguous range split
    in rank space, and a different seed gives a different (but equally
    valid) order.  Oracle-mode value equality is the driver gate's job."""
    import numpy as np

    from tapdata_connectors_ray.pipelines.training import (
        SHUFFLE_SHARDS,
        q_shuffle_epoch_order,
    )

    frames = {
        mode_seed: q_shuffle_epoch_order(SF, hash_mode=mode_seed[0],
                                         seed=mode_seed[1]).to_pandas()
        for mode_seed in (("engine", "ep1"), ("engine", "ep2"), ("oracle", "ep1"))
    }
    orders = {}
    for (mode, seed), df in frames.items():
        n = len(df)
        assert sorted(df["epoch_rank"]) == list(range(1, n + 1)), (mode, seed)
        assert df["doc_id"].is_unique
        srt = df.sort_values("epoch_rank")
        # contiguous range sharding: shard is non-decreasing in rank order,
        # hits every shard, and sizes differ by at most 1
        shard = srt["shard"].to_numpy()
        assert (np.diff(shard) >= 0).all()
        sizes = srt.groupby("shard").size()
        assert list(sizes.index) == list(range(SHUFFLE_SHARDS))
        assert sizes.max() - sizes.min() <= 1
        orders[(mode, seed)] = srt["doc_id"].tolist()

    # determinism: engine/ep1 re-run reproduces itself
    again = q_shuffle_epoch_order(SF, hash_mode="engine", seed="ep1").to_pandas()
    assert again.sort_values("epoch_rank")["doc_id"].tolist() == orders[("engine", "ep1")]
    # seed independence: ep2 is a different permutation of the same docs
    assert orders[("engine", "ep1")] != orders[("engine", "ep2")]
    assert sorted(orders[("engine", "ep1")]) == sorted(orders[("engine", "ep2")])
    # the two hash modes are different functions, same contract
    assert orders[("oracle", "ep1")] != orders[("engine", "ep1")]


def test_sample_mixture_balances_strata_in_engine_mode(ray_session):
    """Mixture sampling must down-sample every language toward the smallest
    stratum's size in BOTH hash modes (oracle-mode membership parity is the
    driver gate's job): every stratum survives, expected size == min_n for
    each, and membership is deterministic across runs."""
    import pyarrow.parquet as _pq

    from tapdata_connectors_ray.pipelines.relational import (
        q_sample_mixture_documents,
    )

    full = _pq.read_table(SF + "/documents.parquet", columns=["lang"])
    counts = full["lang"].to_pandas().value_counts()
    min_n = int(counts.min())

    got = q_sample_mixture_documents(SF, hash_mode="engine").to_pandas()
    sizes = got["lang"].value_counts()
    assert set(sizes.index) == set(counts.index)  # every stratum survives
    for lang, n in sizes.items():
        # binomial(n_lang, min_n/n_lang): allow 4 sigma around min_n
        sigma = (min_n * (1 - min_n / counts[lang])) ** 0.5
        assert abs(n - min_n) <= max(4 * sigma, 3), (lang, n, min_n)
    again = q_sample_mixture_documents(SF, hash_mode="engine").to_pandas()
    assert sorted(again["doc_id"]) == sorted(got["doc_id"])


def test_quality_classifier_kernel_and_trained_weights(ray_session):
    """The vectorized batch scorer == a per-doc brute force on a hand-built
    batch (double-space artifacts, empty text -> no row), engine and oracle
    modes agree on n_feats, and a broadcast trained-weight table swaps in."""
    import pyarrow as pa
    import ray as _ray

    from tapdata_connectors_ray.functions.texthash import TokenHasher
    from tapdata_connectors_ray.stages.textqc import (
        CLS_BUCKETS,
        CLS_MULT,
        QualityClassifier,
    )

    texts = ["Hello  world", "the the THE", "", "one two three four"]
    batch = pa.table({"doc_id": pa.array([1, 2, 3, 4], pa.int64()),
                      "text": pa.array(texts)})

    for mode in ("engine", "oracle"):
        out = QualityClassifier(hash_mode=mode)(batch)
        hasher = TokenHasher(mode)
        exp = {}
        for i, t in enumerate(texts):
            toks = [w for w in t.lower().split(" ") if w]
            if not toks:
                continue  # doc 3: no row
            b = (hasher.many(toks) % np.uint64(CLS_BUCKETS)).astype(np.int64)
            w = ((b.astype(np.uint64) * np.uint64(CLS_MULT))
                 % np.uint64(1000)).astype(np.int64) - 500
            exp[i + 1] = (len(toks), int(w.sum()))
        assert out["doc_id"].to_pylist() == list(exp)
        assert out["n_feats"].to_pylist() == [v[0] for v in exp.values()], mode
        assert out["score_milli"].to_pylist() == [v[1] for v in exp.values()], mode
        assert out["keep_flag"].to_pylist() == [
            int(v[1] > 0) for v in exp.values()
        ], mode

    # trained-model swap: a broadcast all-ones table scores == n_feats
    ones = _ray.put(np.ones(CLS_BUCKETS, dtype=np.int64))
    out = QualityClassifier(hash_mode="engine", weights=ones)(batch)
    assert out["score_milli"].to_pylist() == out["n_feats"].to_pylist()


def test_vocab_top_df_mode_invariant_and_bruteforce(ray_session):
    """The token digest is ONLY the distributed group key, so engine and
    oracle hash modes must produce IDENTICAL (tok, df) output — and both
    must equal a driver-side brute force over the corpus."""
    import pyarrow.parquet as _pq

    from tapdata_connectors_ray.pipelines.training import VOCAB_TOP, q_vocab_top_df

    eng = q_vocab_top_df(SF, hash_mode="engine")
    ora = q_vocab_top_df(SF, hash_mode="oracle")
    assert eng.equals(ora)

    docs = _pq.read_table(SF + "/documents.parquet", columns=["text"])
    df_count: dict[str, int] = {}
    for t in docs["text"].to_pylist():
        for tok in set((t or "").lower().split(" ")):
            if tok:
                df_count[tok] = df_count.get(tok, 0) + 1
    exp = sorted(df_count.items(), key=lambda kv: (-kv[1], kv[0]))[:VOCAB_TOP]
    assert list(zip(eng["tok"], eng["df"])) == exp
