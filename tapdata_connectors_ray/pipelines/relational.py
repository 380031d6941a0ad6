"""Driver-table query pipelines: the advance-filter algebra, consistency
aggregates, partition planning and windowed aggregates over the testdata
tables — each paired with a DuckDB oracle in entrypoints.py.

These are the conformance surface for survey §2.4/§2.5 (plus the
training-pipeline windowed aggregate the reference lacks), expressed
Ray-Data-first: pruned reads, vectorized predicates, partial aggregation
before any shuffle.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data
from ray.data.aggregate import Count, Sum

from tapdata_connectors_ray.functions.aggregates import (
    batch_count,
    count_by_filter,
    min_max,
    table_hash,
)
from tapdata_connectors_ray.functions.partition_planner import pk_range_boundaries
from tapdata_connectors_ray.functions.query import (
    AdvanceFilter,
    QueryOperator,
    SortOn,
    apply_advance_filter,
)


def _t(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


# -- advance-filter algebra --------------------------------------------------


def q_af_lineitem_filter_sort_limit(sf_dir: str):
    """Predicate + projection + multi-key sort + skip/limit paging
    (``CommonDbConnector.java:681-735``).  Sort keys are a unique composite
    so paging is deterministic for the oracle comparison."""
    ds = ray.data.read_parquet(
        _t(sf_dir, "lineitem"),
        columns=["l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_shipdate"],
    )
    flt = AdvanceFilter(
        operators=[
            QueryOperator("l_quantity", "gte", 30.0),
            QueryOperator("l_shipdate", "lt", pd.Timestamp("1997-01-01")),
        ],
        projection=["l_orderkey", "l_linenumber", "l_extendedprice"],
        sort_on=[
            SortOn("l_extendedprice", descending=True),
            SortOn("l_orderkey"),
            SortOn("l_linenumber"),
        ],
        skip=10,
        limit=100,
    )
    return apply_advance_filter(ds, flt)


def q_af_customer_match(sf_dir: str):
    """Conjunctive equality match + projection (``buildKeyAndValue``)."""
    ds = ray.data.read_parquet(_t(sf_dir, "customer"))
    flt = AdvanceFilter(
        match={"c_mktsegment": "BUILDING"},
        projection=["c_custkey", "c_name", "c_acctbal"],
    )
    return apply_advance_filter(ds, flt)


# -- consistency aggregates --------------------------------------------------


def q_batch_count_orders(sf_dir: str):
    n = batch_count(ray.data.read_parquet(_t(sf_dir, "orders"), columns=["o_orderkey"]))
    return pd.DataFrame({"n": [n]})


def q_count_by_filter_events(sf_dir: str):
    ds = ray.data.read_parquet(_t(sf_dir, "events"), columns=["event_type", "value"])
    flt = AdvanceFilter(
        match={"event_type": "click"}, operators=[QueryOperator("value", "gte", 50.0)]
    )
    return pd.DataFrame({"n": [count_by_filter(ds, flt)]})


def q_min_max_lineitem(sf_dir: str):
    ds = ray.data.read_parquet(_t(sf_dir, "lineitem"), columns=["l_extendedprice"])
    mn, mx = min_max(ds, "l_extendedprice")
    return pd.DataFrame({"mn": [round(float(mn), 6)], "mx": [round(float(mx), 6)]})


CUSTOMER_HASH_COLS = ["c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"]


def q_table_hash_customer(sf_dir: str):
    ds = ray.data.read_parquet(_t(sf_dir, "customer"), columns=CUSTOMER_HASH_COLS)
    return pd.DataFrame({"table_hash": [table_hash(ds, CUSTOMER_HASH_COLS)]})


def q_hash_split_shard(sf_dir: str):
    """One mod-shard of the hash-split parallel snapshot read
    (``mod(pk, maxSplit) = i``, ``CommonDbConnector.java:621-674``)."""
    ds = ray.data.read_parquet(
        _t(sf_dir, "lineitem"), columns=["l_orderkey", "l_quantity"]
    )

    def shard(batch: pa.Table) -> pa.Table:
        keys = batch["l_orderkey"].to_numpy(zero_copy_only=False)
        return batch.filter(pa.array(keys % 20 == 3))

    sharded = ds.map_batches(shard, batch_format="pyarrow", zero_copy_batch=True)
    row = sharded.aggregate(
        Count(alias_name="n"), Sum("l_quantity", alias_name="sum_qty")
    )
    return pd.DataFrame({"n": [int(row["n"])], "sum_qty": [round(float(row["sum_qty"]), 6)]})


def q_table_stats_orders(sf_dir: str):
    """Catalog-stats analogue (``MysqlConnector.java:774-780``): row count
    from parquet footer metadata only — no data scan."""
    from tapdata_connectors_ray.functions.aggregates import table_stats

    st = table_stats(_t(sf_dir, "orders"))
    return pd.DataFrame({"num_rows": [st["num_rows"]]})


def q_point_lookup_customer(sf_dir: str):
    """Single-row exact-match fetch (``queryByFilter``,
    ``CommonDbConnector.java:377-398``): key predicate pushed into the
    parquet read (row-group pruning), limit 1."""
    import pyarrow.dataset as pads

    ds = ray.data.read_parquet(
        _t(sf_dir, "customer"),
        columns=["c_custkey", "c_name", "c_acctbal"],
        filter=(pads.field("c_custkey") == 42),
    )
    return ds.limit(1)


def q_pk_range_boundaries_orders(sf_dir: str):
    return pk_range_boundaries(_t(sf_dir, "orders"), "o_orderkey", every=5000)


def q_pk_range_boundaries_strings(sf_dir: str):
    """String-keyed snapshot splitting (the reference's string/ObjectId
    splitters): histogram over an 8-byte fixed-prefix key after skipping the
    table-wide common prefix — no global sort, no driver stream."""
    return pk_range_boundaries(_t(sf_dir, "customer"), "c_name", every=25)


def q_source_sql_command(sf_dir: str):
    """Raw SQL command source (the reference's executeCommand / query
    passthrough): a window-function one-off the operator algebra doesn't
    cover runs via the lake's SQL surface (DuckDB inside ONE Ray task),
    and the RAY pipeline continues on the result — a vectorized derived
    column + filter over the returned Dataset."""
    from tapdata_connectors_ray.sources.sqlcmd import read_sql_command

    sql = """
        SELECT o_custkey, count(*) AS n_orders,
               round(sum(o_totalprice), 6) AS total,
               max(o_orderdate) AS last_order
        FROM orders GROUP BY o_custkey
    """
    ds = read_sql_command(sql, {"orders": _t(sf_dir, "orders")})

    def continue_in_ray(batch: pa.Table) -> pa.Table:
        # identical operands to the oracle's total / n_orders -> identical
        # IEEE result; no pre-rounding (round-mode parity trap)
        avg = pc.divide(batch["total"], pc.cast(batch["n_orders"], pa.float64()))
        batch = batch.append_column("avg_price", avg)
        return batch.filter(pc.greater_equal(batch["n_orders"], 3))

    return ds.map_batches(continue_in_ray, batch_format="pyarrow", zero_copy_batch=True)


def q_distinct_segments(sf_dir: str):
    vals = ray.data.read_parquet(
        _t(sf_dir, "customer"), columns=["c_mktsegment"]
    ).unique("c_mktsegment")
    return pd.DataFrame({"c_mktsegment": sorted(vals)})


# -- distributed quantiles + column profiling --------------------------------


_QUANTILES = (0.25, 0.5, 0.75, 0.95)


def q_quantiles_lineitem(sf_dir: str):
    """EXACT distributed quantiles of ``l_quantity`` via value-count partial
    aggregation: per-batch ``value_counts`` (vectorized), a tiny
    ``groupby(value).sum`` over the ~50 distinct values, then the
    ``quantile_disc`` rank rule (``sorted[ceil(q*n)-1]``) on the driver —
    the reduced (value, count) table is metadata-scale, never data-scale.
    Scale note: exact-by-value-counts holds while distinct values stay
    bounded (measures, enums, scores); unbounded columns take a sketch
    (t-digest / KLL) with the same partial-then-merge shape."""
    from ray.data.aggregate import Sum

    ds = ray.data.read_parquet(_t(sf_dir, "lineitem"), columns=["l_quantity"])

    def counts(batch: pa.Table) -> pa.Table:
        vc = batch["l_quantity"].to_pandas().value_counts()
        return pa.table(
            {"v": vc.index.to_numpy(np.float64), "cnt": vc.to_numpy(np.int64)}
        )

    parts = (
        ds.map_batches(counts, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("v")
        .aggregate(Sum("cnt", alias_name="cnt"))
        .to_pandas()
        .sort_values("v")
    )
    n = int(parts["cnt"].sum())
    cum = parts["cnt"].cumsum().to_numpy()
    vals = parts["v"].to_numpy()
    out = {}
    for q in _QUANTILES:
        rank = int(np.ceil(q * n))  # quantile_disc: sorted[ceil(q*n)-1]
        out[f"p{int(q * 100)}"] = [float(vals[np.searchsorted(cum, rank)])]
    return pd.DataFrame(out)


_PROFILE_COLS = ("c_acctbal", "c_mktsegment", "c_nationkey")


def q_profile_customer(sf_dir: str):
    """Column profiling (discovery-time data stats): null count, exact
    distinct count, min/max per column — one vectorized pass for
    null/min/max (Ray's multi-aggregate), one pass for exact distincts
    (per-batch distinct HASHES -> coarse-bucket fold, so the shuffle carries
    per-batch-distinct rows and the per-bucket ``nunique`` is vectorized;
    the HLL drop-in keeps the same partial-then-merge shape at unbounded
    cardinality)."""
    from ray.data.aggregate import Count, Max, Min

    from tapdata_connectors_ray.functions.hashing import hash_column

    ds = ray.data.read_parquet(_t(sf_dir, "customer"), columns=list(_PROFILE_COLS))
    aggs = [Count(alias_name="n_rows")]
    for c in _PROFILE_COLS:
        aggs += [
            Count(c, alias_name=f"nn_{c}"),
            Min(c, alias_name=f"min_{c}"),
            Max(c, alias_name=f"max_{c}"),
        ]
    stats = ds.aggregate(*aggs)

    def distinct_hashes(batch: pa.Table) -> pa.Table:
        cols, hs = [], []
        for i, c in enumerate(_PROFILE_COLS):
            col = pc.drop_null(batch[c])  # count(DISTINCT c) excludes NULLs
            h = np.unique(hash_column(col).view(np.int64))
            hs.append(h)
            cols.append(np.full(len(h), i, np.int8))
        h = np.concatenate(hs)
        return pa.table(
            {
                "col": pa.array(np.concatenate(cols), pa.int8()),
                "h": pa.array(h),
                "hbucket": pa.array((h % 64).astype(np.int32), pa.int32()),
            }
        )

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("col")["h"].nunique()
        return pd.DataFrame({"col": g.index.to_numpy(), "nd": g.to_numpy()})

    nd = (
        ds.map_batches(distinct_hashes, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("hbucket")
        .map_groups(fold, batch_format="pandas")
        .to_pandas()
        .groupby("col")["nd"]
        .sum()
    )
    rows = []
    for i, c in enumerate(_PROFILE_COLS):
        rows.append(
            {
                "column": c,
                "null_count": int(stats["n_rows"] - stats[f"nn_{c}"]),
                "n_distinct": int(nd.loc[i]),
                "min_val": str(stats[f"min_{c}"]),
                "max_val": str(stats[f"max_{c}"]),
            }
        )
    return pd.DataFrame(rows).sort_values("column").reset_index(drop=True)


# -- broadcast-dim enrichment / deterministic sampling -----------------------


def q_lookup_enrich_customer(sf_dir: str):
    """Stream enrichment against broadcast dimension tables (the cache/lookup
    processor shape: a big fact stream picks up names from O(25)-row dims).

    Scale pattern: nation+region are read ONCE on the driver (dim scale, not
    data scale), composed into dense arrays indexed by ``n_nationkey`` and
    shipped via ``ray.put`` — every map task reads them zero-copy from its
    node's object store.  No shuffle; the big side streams.  Contrast with
    ``master_subdoc_merge``, which hash-joins because both sides are big."""
    import pyarrow.parquet as pq

    nation = pq.read_table(_t(sf_dir, "nation")).to_pandas()
    region = pq.read_table(_t(sf_dir, "region")).to_pandas()
    m = nation.merge(region, left_on="n_regionkey", right_on="r_regionkey")
    size = int(m["n_nationkey"].max()) + 1
    n_names = np.empty(size, object)
    r_names = np.empty(size, object)
    n_names[m["n_nationkey"].to_numpy()] = m["n_name"].to_numpy()
    r_names[m["n_nationkey"].to_numpy()] = m["r_name"].to_numpy()
    dim_ref = ray.put((n_names, r_names))

    def enrich(batch: pa.Table) -> pa.Table:
        nn, rn = ray.get(dim_ref)  # zero-copy from the local object store
        k = batch["c_nationkey"].to_numpy()
        return (
            batch.append_column("nation", pa.array(nn[k], pa.string()))
            .append_column("region", pa.array(rn[k], pa.string()))
            .drop_columns(["c_nationkey"])
        )

    ds = ray.data.read_parquet(
        _t(sf_dir, "customer"), columns=["c_custkey", "c_name", "c_acctbal", "c_nationkey"]
    )
    return ds.map_batches(enrich, batch_format="pyarrow", zero_copy_batch=True)


_MASK_PATTERN = r"\b(customer|spark)\b"


def q_text_mask_documents(sf_dir: str):
    """Data-masking / desensitization processor (the PII-scrub shape): regex
    term masking + per-document hit count, pure Arrow RE2 kernels
    (`replace_substring_regex` / `count_substring_regex`) — the same regex
    engine family DuckDB uses, so semantics match exactly; zero Python in
    the hot path."""
    ds = ray.data.read_parquet(_t(sf_dir, "documents"), columns=["doc_id", "text"])

    def mask(batch: pa.Table) -> pa.Table:
        n = pc.count_substring_regex(batch["text"], _MASK_PATTERN)
        masked = pc.replace_substring_regex(batch["text"], _MASK_PATTERN, "<MASKED>")
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "text_masked": masked,
                "n_masked": n.cast(pa.int64()),
            }
        )

    return ds.map_batches(mask, batch_format="pyarrow", zero_copy_batch=True)


def q_json_props_agg(sf_dir: str):
    """Semi-structured JSON projection + aggregate: the per-event ``props``
    JSON column is parsed VECTORIZED by treating each batch's strings as one
    NDJSON buffer (``pyarrow.json`` C++ parse — no per-row ``json.loads``;
    sound because serialized compact JSON cannot contain a raw newline),
    the projected field pre-aggregates per event_type INSIDE the block, and
    only event-type-cardinality partials leave the workers (the combiner
    shape — the driver fold sees strata x blocks rows, metadata scale).
    Null/absent keys degrade to SQL semantics: ``count(*)`` counts the row,
    the SUM skips it."""
    import io

    from pyarrow import json as pa_json

    ds = ray.data.read_parquet(_t(sf_dir, "events"), columns=["event_type", "props"])

    def partial(batch: pa.Table) -> pa.Table:
        empty = pa.table(
            {
                "event_type": pa.array([], pa.string()),
                "n": pa.array([], pa.int64()),
                "sum_k": pa.array([], pa.int64()),
            }
        )
        if batch.num_rows == 0:
            return empty
        rows = ["{}" if v is None else v for v in batch["props"].to_pylist()]
        parsed = pa_json.read_json(io.BytesIO("\n".join(rows).encode()))
        k = (
            parsed["k"].to_pandas()
            if "k" in parsed.column_names
            else pd.Series([np.nan] * len(rows))
        )
        df = pd.DataFrame({"event_type": batch["event_type"].to_pandas(), "k": k})
        g = df.groupby("event_type", sort=False)["k"].agg(["size", "sum"])
        return pa.table(
            {
                "event_type": pa.array(g.index.to_numpy(dtype=object), pa.string()),
                "n": pa.array(g["size"].to_numpy(np.int64), pa.int64()),
                "sum_k": pa.array(g["sum"].to_numpy(np.int64), pa.int64()),
            }
        )

    parts = ds.map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True
    ).to_pandas()  # strata x blocks — metadata scale
    out = parts.groupby("event_type", as_index=False).agg(
        n=("n", "sum"), sum_k=("sum_k", "sum")
    )
    return out.sort_values("event_type").reset_index(drop=True)


def q_sample_hash_documents(sf_dir: str, hash_mode: str = "oracle"):
    """Deterministic hash sampling (mod-shard on a stable key digest): the
    repeatable train/eval split and down-sampling primitive — every worker
    agrees on membership with no coordination, and re-runs are stable.
    The digest is behind the engine/oracle seam (``row_hash64``): the
    driver-checked query pins "oracle" (md5 parity with the SQL's
    ``md5_number_lower``, which decides MEMBERSHIP, so values must match);
    production passes "engine" for the vectorized SipHash digest — an
    equally uniform, equally stable split, one vectorized call per batch."""
    from tapdata_connectors_ray.functions.texthash import row_hash64

    ds = ray.data.read_parquet(
        _t(sf_dir, "documents"), columns=["doc_id", "lang", "n_chars"]
    )

    def keep(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].cast(pa.string()).to_pylist()  # == CAST(.. AS VARCHAR)
        h = row_hash64(ids, hash_mode) % np.uint64(20)
        return batch.filter(pa.array(h == np.uint64(3)))

    return ds.map_batches(keep, batch_format="pyarrow", zero_copy_batch=True)


_STRATIFIED_K = 20
_MIX_SEED = "mix"
_MIX_DENOM = 1000


def q_sample_mixture_documents(sf_dir: str, hash_mode: str = "oracle"):
    """Deterministic MIXTURE sampling (domain/language reweighting): each
    stratum is down-sampled to the SMALLEST stratum's size in expectation —
    the balanced-mixture primitive for training-corpus composition (the
    per-stratum acceptance-rate generalization of ``q_sample_hash_documents``;
    arbitrary target weights are the same mechanism with a different rate
    table).  Two phases, no shuffle of the corpus: (1) a narrow pass
    pre-aggregates per-block (lang, count) partials — strata x blocks rows,
    metadata scale — which the driver folds into per-stratum acceptance
    rates; (2) the corpus pass accepts a doc iff
    ``(digest % DENOM) * n_lang < min_n * DENOM`` — EXACT integer math, so
    membership is identical under any arithmetic (the SQL oracle mirrors it
    literally), stable across runs, and needs no coordination.  Digest
    behind the engine/oracle seam, same contract as the other samplers."""
    from tapdata_connectors_ray.functions.texthash import row_hash64

    ds = ray.data.read_parquet(_t(sf_dir, "documents"), columns=["doc_id", "lang"])

    def lang_partial(batch: pa.Table) -> pa.Table:
        vc = batch["lang"].to_pandas().value_counts()
        return pa.table(
            {
                "lang": pa.array(vc.index.astype(str), pa.string()),
                "n": pa.array(vc.to_numpy(), pa.int64()),
            }
        )

    counts = (
        ds.map_batches(lang_partial, batch_format="pyarrow", zero_copy_batch=True)
        .to_pandas()  # strata x blocks — metadata scale
        .groupby("lang")["n"]
        .sum()
    )
    min_n = int(counts.min())
    n_by_lang = ray.put(counts.astype(int).to_dict())

    def accept(batch: pa.Table) -> pa.Table:
        n_lang = ray.get(n_by_lang)
        # a null stratum has no rate — dropped, like the oracle's inner join
        batch = batch.filter(pc.is_valid(batch["lang"]))
        ids = batch["doc_id"].cast(pa.string()).to_pylist()
        bucket = (row_hash64([s + ":" + _MIX_SEED for s in ids], hash_mode)
                  % np.uint64(_MIX_DENOM)).astype(np.int64)
        n = batch["lang"].to_pandas().map(n_lang).to_numpy(dtype=np.int64)
        return batch.filter(pa.array(bucket * n < min_n * _MIX_DENOM))

    return ds.map_batches(accept, batch_format="pyarrow", zero_copy_batch=True)


def q_sample_stratified_documents(sf_dir: str, hash_mode: str = "oracle"):
    """Deterministic STRATIFIED sampling: the K lowest-digest docs per
    stratum (language) — the balanced-eval-set primitive (uniform hash
    sampling under-represents small strata).  Distributed top-k: each batch
    keeps only its own K best per stratum, so the driver merge sees
    ≤ strata x K x blocks rows (metadata scale) — the same lossless
    per-block-truncation argument as the ANN top-k.  Digest behind the
    engine/oracle seam, same contract as ``q_sample_hash_documents``."""
    from tapdata_connectors_ray.functions.texthash import row_hash64

    ds = ray.data.read_parquet(_t(sf_dir, "documents"), columns=["doc_id", "lang"])

    def partial(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].cast(pa.string()).to_pylist()
        df = pd.DataFrame(
            {
                "lang": batch["lang"].to_pandas(),
                "doc_id": batch["doc_id"].to_numpy(),
                "h": row_hash64(ids, hash_mode),
            }
        )
        top = (
            df.sort_values(["h", "doc_id"]).groupby("lang", sort=False).head(_STRATIFIED_K)
        )
        return pa.table(
            {
                "lang": pa.array(top["lang"], pa.string()),
                "doc_id": pa.array(top["doc_id"].to_numpy(), pa.int64()),
                "h": pa.array(top["h"].to_numpy(), pa.uint64()),
            }
        )

    parts = ds.map_batches(partial, batch_format="pyarrow", zero_copy_batch=True).to_pandas()
    final = (
        parts.sort_values(["lang", "h", "doc_id"])
        .groupby("lang", sort=True)
        .head(_STRATIFIED_K)
        .reset_index(drop=True)
    )
    final["rank"] = final.groupby("lang").cumcount() + 1
    return final[["lang", "doc_id", "rank"]]


# -- windowed aggregate (training-pipeline op; reference has no windows) -----


_HOP_US = 5 * 60 * 1_000_000  # hop; window size = 2 hops (10 min)


def hopping_expand(batch: pa.Table, hop_us: int = _HOP_US) -> pa.Table:
    """Vectorized hopping-window expansion: each event is tiled into the 2
    overlapping (size = 2×hop) windows that contain it."""
    us = batch["ts"].cast(pa.int64()).to_numpy()
    w0 = (us // hop_us) * hop_us
    uid = batch["user_id"].to_numpy()
    val = batch["value"].to_numpy()
    return pa.table(
        {
            "user_id": np.tile(uid, 2),
            "win_start_us": np.concatenate([w0, w0 - hop_us]),
            "value": np.tile(val, 2),
            "ubucket": np.tile((uid % 64).astype(np.int32), 2),
        }
    )


def hopping_fold(df: pd.DataFrame) -> pa.Table:
    """Per-bucket (user, window) count+sum over the expanded rows.  Output
    schema is PINNED (survey §8.5: Ray emits schema-less zero-column blocks
    for empty sort splits; unpinned fold outputs also trip the executor's
    RefBundle schema-mismatch warning)."""
    g = df.groupby(["user_id", "win_start_us"], sort=False)["value"].agg(
        ["size", "sum"]
    )
    return pa.table(
        {
            "user_id": pa.array(g.index.get_level_values(0).to_numpy(), pa.int64()),
            "win_start_us": pa.array(
                g.index.get_level_values(1).to_numpy(), pa.int64()
            ),
            "n_events": pa.array(g["size"].to_numpy(), pa.int64()),
            "sum_value": pa.array(np.round(g["sum"].to_numpy(), 6), pa.float64()),
        }
    )


def sessions_fold(df: pd.DataFrame, gap_us: int) -> pa.Table:
    """Per-bucket gap-based sessionization: sorted lag/cumsum session
    assignment, then per-user session count + max session length."""
    df = df.sort_values(["user_id", "ts"], kind="stable")
    ts = df["ts"].astype("int64")
    new_user = df["user_id"].ne(df["user_id"].shift())
    gap = ts - ts.shift()
    new_session = new_user | (gap > gap_us)
    df = df.assign(session=new_session.cumsum())
    sess = df.groupby(["user_id", "session"], sort=False).size()
    per_user = sess.groupby(level=0).agg(["count", "max"])
    return pa.table(  # pinned schema — see hopping_fold
        {
            "user_id": pa.array(per_user.index.to_numpy(), pa.int64()),
            "n_sessions": pa.array(per_user["count"].to_numpy(), pa.int64()),
            "max_session_events": pa.array(per_user["max"].to_numpy(), pa.int64()),
        }
    )


def q_events_hopping_window(sf_dir: str):
    """Per-user HOPPING window (size 10 min, hop 5 min — each event lands in
    exactly 2 overlapping windows): vectorized window expansion inside
    ``map_batches`` (duplication factor = size/hop, done with ``np.tile`` —
    no per-row Python), then the coarse-bucket fold: groups in the Ray
    shuffle stay O(buckets), the per-(user, window) aggregate happens in one
    vectorized pandas groupby per bucket (user×window cardinality is
    unbounded at scale — never give it to the grouped-aggregate API raw)."""
    ds = ray.data.read_parquet(_t(sf_dir, "events"), columns=["user_id", "ts", "value"])

    return (
        ds.map_batches(hopping_expand, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("ubucket")
        .map_groups(hopping_fold, batch_format="pandas")
    )


def q_events_tumbling_window(sf_dir: str):
    """Per-user 1-hour tumbling window: event count + value sum.  Windowing =
    vectorized bucket column inside map_batches, then grouped aggregate over
    (user, window) — partial aggregation happens inside Ray's hash aggregate."""
    ds = ray.data.read_parquet(_t(sf_dir, "events"), columns=["user_id", "ts", "value"])

    def add_window(batch: pa.Table) -> pa.Table:
        us = batch["ts"].cast(pa.int64())
        win = pc.divide(us, 3_600_000_000)
        return batch.append_column("win_hour", win).drop_columns(["ts"])

    out = (
        ds.map_batches(add_window, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["user_id", "win_hour"])
        .aggregate(Count(alias_name="n_events"), Sum("value", alias_name="sum_value"))
    )

    def finish(batch: pa.Table) -> pa.Table:
        idx = batch.schema.get_field_index("sum_value")
        return batch.set_column(idx, "sum_value", pc.round(batch["sum_value"], 6))

    return out.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)


LATENESS_US = 1_800_000_000  # 30 min allowed lateness


def q_events_window_late_data(sf_dir: str):
    """Event-time tumbling windows with a WATERMARK and ALLOWED LATENESS —
    the streaming-engine late-data contract (Flink/Beam shape): events are
    processed in arrival order (``event_id``), the watermark is the running
    max event time seen so far, and an event whose ``ts`` lags the watermark
    by more than 30 min is LATE — excluded from its window's aggregate and
    counted into the window's dead-letter tally instead.

    Distributed watermark = the same two-pass prefix pattern as the packing
    prefix-sum: a narrow (event_id, ts) pass emits per-block (first id,
    max ts), the driver prefixes that block-count-scale frame (exclusive
    cummax), and the flagging pass resolves each row's watermark from the
    broadcast map + an in-block exclusive cummax — no driver stream, no
    extra shuffle.  Per-block (win_hour, n, sum, late) partials pre-reduce
    before the tiny final groupby."""
    ds = ray.data.read_parquet(_t(sf_dir, "events"), columns=["event_id", "ts", "value"])

    def narrow(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "event_id": batch["event_id"].cast(pa.int64()),
                "ts_us": batch["ts"].cast(pa.int64()),
                "value": batch["value"],
            }
        )

    rows = ds.map_batches(narrow, batch_format="pyarrow", zero_copy_batch=True).sort(
        "event_id"
    ).materialize()

    def block_meta(batch: pa.Table) -> pa.Table:
        ids = batch["event_id"].to_numpy()
        return pa.table(
            {
                "first_id": pa.array([int(ids[0])] if len(ids) else [], pa.int64()),
                "block_max_ts": pa.array(
                    [int(batch["ts_us"].to_numpy().max())] if len(ids) else [],
                    pa.int64(),
                ),
            }
        )

    meta = (
        rows.map_batches(
            block_meta, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
        )
        .to_pandas()  # block-count scale
        .sort_values("first_id")
    )
    # exclusive prefix max: the watermark carried INTO each block
    # sentinel far below any real timestamp but safe against int64
    # underflow when the lateness is subtracted
    no_wm = -(2**62)
    prev_max = meta["block_max_ts"].cummax().shift(fill_value=no_wm)
    wm_ref = ray.put(dict(zip(meta["first_id"].astype(int), prev_max.astype(int))))

    def flag_and_fold(batch: pa.Table) -> pa.Table:
        import ray as _ray

        empty = pa.table(
            {
                "win_hour": pa.array([], pa.int64()),
                "n_events": pa.array([], pa.int64()),
                "sum_value": pa.array([], pa.float64()),
                "n_late": pa.array([], pa.int64()),
            }
        )
        ids = batch["event_id"].to_numpy()
        if not len(ids):
            return empty
        ts = batch["ts_us"].to_numpy()
        carried = int(_ray.get(wm_ref)[int(ids[0])])
        # per-row watermark = max(carried-in, exclusive in-block cummax)
        inblock = np.empty_like(ts)
        inblock[0] = -(2**62)  # underflow-safe "no watermark yet"
        np.maximum.accumulate(ts[:-1], out=inblock[1:])
        wm = np.maximum(inblock, carried)
        late = ts < wm - LATENESS_US
        df = pd.DataFrame(
            {
                "win_hour": ts // 3_600_000_000,
                "value": batch["value"].to_numpy(),
                "late": late,
            }
        )
        g = df.groupby("win_hour", sort=False)
        on_time = df[~df["late"]].groupby("win_hour", sort=False)["value"]
        n_late = g["late"].sum().astype(np.int64)
        out = pd.DataFrame(
            {
                "n_events": (g.size() - n_late).astype(np.int64),
                "n_late": n_late,
            }
        )
        out["sum_value"] = on_time.sum().reindex(out.index, fill_value=0.0)
        out = out.reset_index()
        return pa.table(
            {
                "win_hour": pa.array(out["win_hour"].to_numpy(), pa.int64()),
                "n_events": pa.array(out["n_events"].to_numpy(), pa.int64()),
                "sum_value": pa.array(out["sum_value"].to_numpy(), pa.float64()),
                "n_late": pa.array(out["n_late"].to_numpy(), pa.int64()),
            }
        )

    partials = rows.map_batches(
        flag_and_fold, batch_format="pyarrow", zero_copy_batch=True, batch_size=None
    )
    agg = partials.groupby("win_hour").aggregate(
        Sum("n_events", alias_name="n_events"),
        Sum("sum_value", alias_name="sum_value"),
        Sum("n_late", alias_name="n_late"),
    )

    def finish(batch: pa.Table) -> pa.Table:
        idx = batch.schema.get_field_index("sum_value")
        return batch.set_column(idx, "sum_value", pc.round(batch["sum_value"], 6))

    return agg.map_batches(finish, batch_format="pyarrow", zero_copy_batch=True)


WINDOW_TOPK = 3


def q_events_window_topk(sf_dir: str):
    """Per-window EXACT heavy hitters: the top-3 event types of every
    1-hour window under (count DESC, type ASC) — the windowed top-k shape
    (trending items / hot keys per interval).  In-block (window, type)
    partial counts pre-reduce before the shuffle; windows are coarse-
    bucketed so the per-bucket fold ranks each window wholly inside one
    task — the shuffle carries ≤ windows×types×blocks narrow partials, and
    nothing unbounded ever groups globally."""
    ds = ray.data.read_parquet(_t(sf_dir, "events"), columns=["ts", "event_type"])

    def partials(batch: pa.Table) -> pa.Table:
        win = batch["ts"].cast(pa.int64()).to_numpy() // 3_600_000_000
        g = (
            pd.DataFrame({"win_hour": win, "event_type": batch["event_type"].to_numpy(zero_copy_only=False)})
            .groupby(["win_hour", "event_type"], sort=False)
            .size()
            .reset_index(name="n_part")
        )
        return pa.table(
            {
                "win_hour": pa.array(g["win_hour"].to_numpy(), pa.int64()),
                "event_type": pa.array(g["event_type"].to_numpy(object), pa.string()),
                "n_part": pa.array(g["n_part"].to_numpy(), pa.int64()),
                "wbucket": pa.array((g["win_hour"].to_numpy() % 256).astype(np.int32)),
            }
        )

    def bucket_rank(df: pd.DataFrame) -> pd.DataFrame:
        g = (
            df.groupby(["win_hour", "event_type"], sort=False)["n_part"]
            .sum()
            .reset_index(name="n_events")
        )
        g = g.sort_values(
            ["win_hour", "n_events", "event_type"],
            ascending=[True, False, True],
            kind="stable",
        )
        g["rank"] = g.groupby("win_hour", sort=False).cumcount() + 1
        return g[g["rank"] <= WINDOW_TOPK].drop(columns=[]).astype(
            {"rank": np.int64}
        )[["win_hour", "event_type", "n_events", "rank"]]

    return (
        ds.map_batches(partials, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("wbucket")
        .map_groups(bucket_rank, batch_format="pandas")
    )


def q_events_window_incremental(sf_dir: str):
    """Epoch-ledgered INCREMENTAL tumbling-window aggregate: the window
    family joined to the incremental-ingest machinery the dedup ledgers
    use (``training.ingest_dedup_epoch``).  Events arrive in three
    deterministic epochs (``event_id % 3`` — a fixed arrival order, so the
    batch oracle still applies); each epoch folds its per-(user, win_hour)
    partials into a user-bucket-partitioned ledger, merging counts/sums
    with the buckets' existing partials.  The union of epochs provably
    equals the one-shot batch answer (same oracle SQL as
    ``events_tumbling_window``).

    Scale shape: an epoch shuffles ONLY its own partials (pre-aggregated
    inside ``map_batches``-sized pandas folds, narrow columns), and each
    touched bucket task reads/rewrites one ledger file — cost
    O(epoch + touched buckets), never a corpus re-scan.  Buckets are
    ``last_epoch``-stamped so a Ray task re-execution skips the re-merge
    and sums never double-apply (same guard as the dedup ledgers)."""
    import pyarrow.parquet as pq

    from tapdata_connectors_ray.pipelines.training import _inc_ledger_dir
    from tapdata_connectors_ray.sources.storage import atomic_put_parquet

    N_BUCKETS = 64
    ledger = _inc_ledger_dir(sf_dir, "window")

    def make_prepare(ep: int):
        def prepare(batch: pa.Table) -> pa.Table:
            eid = batch["event_id"].to_numpy()
            batch = batch.filter(pa.array(eid % 3 == ep - 1))
            us = batch["ts"].cast(pa.int64())
            win = pc.divide(us, 3_600_000_000)
            ub = (batch["user_id"].to_numpy() % N_BUCKETS).astype(np.int32)
            return pa.table(
                {
                    "user_id": batch["user_id"],
                    "win_hour": win,
                    "value": batch["value"],
                    "ubucket": pa.array(ub),
                }
            )

        return prepare

    def make_fold(ep: int):
        def fold(df: pd.DataFrame) -> pd.DataFrame:
            b = int(df["ubucket"].iloc[0])
            g = df.groupby(["user_id", "win_hour"], sort=False)["value"].agg(
                ["size", "sum"]
            )
            inc = pd.DataFrame(
                {
                    "user_id": g.index.get_level_values(0).to_numpy(),
                    "win_hour": g.index.get_level_values(1).to_numpy(),
                    "n_events": g["size"].to_numpy(),
                    "sum_value": g["sum"].to_numpy(),
                }
            )
            path = os.path.join(ledger, f"bucket-{b:04d}.parquet")
            if os.path.exists(path):
                old_t = pq.read_table(path)
                meta = old_t.schema.metadata or {}
                # epochs apply strictly in order, so a stale epoch-e task
                # re-executed after epoch e+1 already merged the bucket
                # (last_epoch > ep) must also skip, not just the == case
                if int(meta.get(b"last_epoch", b"-1")) >= ep:
                    # task re-execution: bucket already absorbed this epoch
                    return pd.DataFrame({"bucket": [b], "rows": [len(old_t)]})
                m = old_t.to_pandas().merge(
                    inc, on=["user_id", "win_hour"], how="outer", suffixes=("_o", "_n")
                )
                out = pd.DataFrame(
                    {
                        "user_id": m["user_id"],
                        "win_hour": m["win_hour"],
                        "n_events": (
                            m["n_events_o"].fillna(0) + m["n_events_n"].fillna(0)
                        ).astype("int64"),
                        "sum_value": m["sum_value_o"].fillna(0.0)
                        + m["sum_value_n"].fillna(0.0),
                    }
                )
            else:
                out = inc
            out_t = pa.Table.from_pandas(out, preserve_index=False)
            atomic_put_parquet(
                out_t.replace_schema_metadata({"last_epoch": str(ep)}), path
            )
            return pd.DataFrame({"bucket": [b], "rows": [len(out)]})

        return fold

    for ep in (1, 2, 3):
        (
            ray.data.read_parquet(
                _t(sf_dir, "events"), columns=["event_id", "user_id", "ts", "value"]
            )
            .map_batches(make_prepare(ep), batch_format="pyarrow", zero_copy_batch=True)
            .groupby("ubucket")
            .map_groups(make_fold(ep), batch_format="pandas")
            .materialize()  # drive the epoch; output is bucket summaries
        )

    def finish(batch: pa.Table) -> pa.Table:
        idx = batch.schema.get_field_index("sum_value")
        return batch.set_column(idx, "sum_value", pc.round(batch["sum_value"], 6))

    return ray.data.read_parquet(ledger).map_batches(
        finish, batch_format="pyarrow", zero_copy_batch=True
    )


def q_events_session_windows(sf_dir: str):
    """Gap-based sessionization (30-min inactivity): per-user session count +
    max session length.  Streaming-only semantics the reference lacks
    (survey §2.10: 'windows: none').  Users are coarse-bucketed so the
    per-bucket pandas pass is vectorized over many users at once; session
    assignment = sorted lag/cumsum, no per-row Python."""
    GAP_US = 30 * 60 * 1_000_000

    ds = ray.data.read_parquet(_t(sf_dir, "events"), columns=["user_id", "ts"])

    def bucket(batch: pa.Table) -> pa.Table:
        u = batch["user_id"].to_numpy()
        return batch.append_column("ubucket", pa.array((u % 64).astype(np.int32)))

    def sessions(df: pd.DataFrame) -> pd.DataFrame:
        return sessions_fold(df, GAP_US)

    return (
        ds.map_batches(bucket, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("ubucket")
        .map_groups(sessions, batch_format="pandas")
    )


# -- as-of / range joins (custom operators Ray Data lacks) -------------------

_ASOF_BUCKETS = 64
FOLLOW_GAP_US = 5 * 60 * 1_000_000


def q_events_asof_join(sf_dir: str):
    """As-of join: each *purchase* event picks up the latest *view* event of
    the same user at or before its timestamp (attribution lookup — the
    classic as-of shape Ray Data has no native operator for).

    Ray shape: ONE pruned read, both sides tagged and hash-bucketed by
    ``user_id`` in a vectorized ``map_batches``, then a single shuffle
    (``groupby(bucket)``) and a per-bucket ``pd.merge_asof`` (vectorized
    backward search, ``by=user_id``) — the standard composition (a) from the
    survey: co-partition on the equality key, sort-merge within partitions.
    Partitioning assumption: all rows of one user land in one bucket; bucket
    count is the lake's logical partition granularity.  Ties on the right
    side (same user, same ts) are broken to the max ``event_id`` on both
    engines, so the match is deterministic."""
    ds = ray.data.read_parquet(
        _t(sf_dir, "events"), columns=["event_id", "ts", "user_id", "event_type", "value"]
    )

    def tag_and_bucket(batch: pa.Table) -> pa.Table:
        is_l = pc.equal(batch["event_type"], "purchase")
        is_r = pc.equal(batch["event_type"], "view")
        t = batch.filter(pc.or_(is_l, is_r))
        side = pc.if_else(pc.equal(t["event_type"], "purchase"), 1, 0)
        u = t["user_id"].to_numpy(zero_copy_only=False)
        return (
            t.drop_columns(["event_type"])
            .append_column("side", side.cast(pa.int8()))
            .append_column("ubucket", pa.array((u % _ASOF_BUCKETS).astype(np.int32)))
        )

    return (
        ds.map_batches(tag_and_bucket, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("ubucket")
        .map_groups(asof_fold, batch_format="pandas")
    )


def asof_fold(df: pd.DataFrame) -> pd.DataFrame:
    """Per-bucket as-of: left = side 1, right = side 0; backward match by
    user with max-event_id tie-break on equal right timestamps."""
    left = df[df["side"] == 1]
    right = df[df["side"] == 0].sort_values(["ts", "event_id"], kind="stable")
    # dedupe right per (user_id, ts): keep max event_id (oracle tie-break)
    right = right.drop_duplicates(["user_id", "ts"], keep="last")
    out = pd.merge_asof(
        left.sort_values("ts", kind="stable"),
        right.sort_values("ts", kind="stable"),
        on="ts",
        by="user_id",
        direction="backward",
        suffixes=("", "_r"),
    )
    return pd.DataFrame(
        {
            "event_id": out["event_id"].to_numpy(),
            "user_id": out["user_id"].to_numpy(),
            "ts": out["ts"].to_numpy(),
            "view_event_id": out["event_id_r"].astype("float64").to_numpy(),
            "view_value": out["value_r"].astype("float64").to_numpy(),
        }
    )


def q_events_follow_within(sf_dir: str):
    """Range (interval) join: for every event, the number of same-user
    events in the following 5 minutes — a non-equi self-join
    (``r.ts > l.ts AND r.ts <= l.ts + gap``).

    Ray shape: hash-bucket by user, one shuffle, then a fully vectorized
    per-bucket count: rows sorted by (user, ts) are laid on a single
    strictly-separated timeline (per-user offset of span + 2·gap) so ONE
    pair of ``np.searchsorted`` calls answers every row's interval count —
    no per-user Python loop, no pairwise blow-up.  Assumption: per-bucket
    ``n_users × (global_ts_span + 2·gap)`` fits int64 (~9.2e18); with ≥64k
    buckets at lake scale this holds by orders of magnitude."""
    ds = ray.data.read_parquet(_t(sf_dir, "events"), columns=["event_id", "ts", "user_id"])

    def bucket(batch: pa.Table) -> pa.Table:
        u = batch["user_id"].to_numpy(zero_copy_only=False)
        return batch.append_column(
            "ubucket", pa.array((u % _ASOF_BUCKETS).astype(np.int32))
        )

    return (
        ds.map_batches(bucket, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("ubucket")
        .map_groups(follow_count_fold, batch_format="pandas")
    )


def follow_count_fold(df: pd.DataFrame, gap_us: int = FOLLOW_GAP_US) -> pd.DataFrame:
    """Per-bucket interval count via the strictly-separated-timeline trick
    (see q_events_follow_within docstring for the overflow bound)."""
    df = df.sort_values(["user_id", "ts"], kind="stable")
    ts = df["ts"].astype("int64").to_numpy()
    user = df["user_id"].to_numpy()
    new_user = np.empty(len(df), dtype=bool)
    new_user[0] = True
    new_user[1:] = user[1:] != user[:-1]
    uidx = np.cumsum(new_user) - 1  # dense per-bucket user ordinal
    span = int(ts.max() - ts.min()) if len(ts) else 0
    base = np.int64(span + 2 * gap_us)
    # subtract each user's min ts so the shifted key can't overflow
    umin = np.minimum.reduceat(ts, np.flatnonzero(new_user))[uidx]
    shifted = (ts - umin) + uidx * base
    hi = np.searchsorted(shifted, shifted + gap_us, side="right")
    lo = np.searchsorted(shifted, shifted, side="right")
    return pd.DataFrame(
        {"event_id": df["event_id"].to_numpy(), "n_follow": (hi - lo).astype(np.int64)}
    )


BIGRAM_TOPK = 20
_BIGRAM_BUCKETS = 64


def q_text_bigram_topk(sf_dir: str):
    """Top-20 word bigrams over the documents corpus, distributed top-k:
    vectorized explode + in-block value_counts combiner -> coarse-bucket
    groupby (each bigram lives in exactly one bucket) -> per-bucket exact
    count + per-bucket top-k under the global (n DESC, bigram ASC) order ->
    tiny driver merge of buckets x k rows.  No unbounded-cardinality
    grouped aggregate, no full-count ``to_pandas``."""
    ds = ray.data.read_parquet(_t(sf_dir, "documents"), columns=["text"])

    def bigram_partials(batch: pa.Table) -> pa.Table:
        words = (
            pd.Series(batch["text"].to_pylist(), dtype=object)
            .str.lower()
            .str.split(" ")
            .to_numpy()
        )
        if len(words) == 0:
            return pa.table(
                {"bigram": pa.array([], pa.string()),
                 "n_part": pa.array([], pa.int64()),
                 "bucket": pa.array([], pa.int32())}
            )
        flat = np.concatenate([np.asarray(w, dtype=object) for w in words])
        lens = np.fromiter((len(w) for w in words), dtype=np.int64, count=len(words))
        keep = np.ones(max(len(flat) - 1, 0), dtype=bool)
        keep[np.cumsum(lens)[:-1] - 1] = False  # no bigrams across doc bounds
        bg = pd.Series(flat[:-1][keep]) + " " + pd.Series(flat[1:][keep])
        vc = bg.value_counts()  # in-block combiner
        grams = vc.index.to_numpy(dtype=object)
        bucket = (
            pd.util.hash_array(grams) % np.uint64(_BIGRAM_BUCKETS)
        ).astype(np.int32)
        return pa.table(
            {
                "bigram": pa.array(grams, type=pa.string()),
                "n_part": pa.array(vc.to_numpy(), type=pa.int64()),
                "bucket": pa.array(bucket, type=pa.int32()),
            }
        )

    def bucket_topk(df: pd.DataFrame) -> pd.DataFrame:
        g = df.groupby("bigram", sort=False)["n_part"].sum().reset_index(name="n")
        g = g.sort_values(["n", "bigram"], ascending=[False, True], kind="stable")
        return g.head(BIGRAM_TOPK)

    cands = (
        ds.map_batches(bigram_partials, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("bucket")
        .map_groups(bucket_topk, batch_format="pandas")
        .to_pandas()  # buckets x k rows — driver-side merge is tiny
    )
    top = cands.sort_values(["n", "bigram"], ascending=[False, True], kind="stable")
    return top.head(BIGRAM_TOPK).reset_index(drop=True)


def q_typelattice_roundtrip(sf_dir: str):
    """Codec-registry conformance (survey §1.3 / EveryTapValueToTarget):
    a table covering every portable type goes through the write-side encode
    and read-side decode codecs inside a Ray pipeline; reports per-type
    round-trip fidelity.  Rows-only: nested/binary types have no stable SQL
    text form to hash against."""
    import ray.data

    from tapdata_connectors_ray.functions.codecs import (
        decode_from_target,
        encode_for_target,
        lattice_sample_table,
    )

    t = lattice_sample_table(256)
    schema = t.schema

    out = (
        ray.data.from_arrow(t)
        .map_batches(lambda b: encode_for_target(b, schema), batch_format="pyarrow")
        .map_batches(lambda b: decode_from_target(b, schema), batch_format="pyarrow")
    )
    got = pa.Table.from_pylist(out.take_all(), schema=schema)
    return pd.DataFrame(
        {
            "tap_type": schema.names,
            "n_values": [t.num_rows] * len(schema.names),
            "roundtrip_ok": [bool(got[c].equals(t[c])) for c in schema.names],
        }
    )


# -- DuckDB oracles ----------------------------------------------------------

RELATIONAL_SQL: dict[str, str] = {
    "af_lineitem_filter_sort_limit": """
        SELECT l_orderkey, l_linenumber, l_extendedprice
        FROM lineitem
        WHERE l_quantity >= 30.0 AND l_shipdate < TIMESTAMP '1997-01-01'
        ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
        LIMIT 100 OFFSET 10
    """,
    "af_customer_match": """
        SELECT c_custkey, c_name, c_acctbal
        FROM customer WHERE c_mktsegment = 'BUILDING'
    """,
    "batch_count_orders": "SELECT count(*) AS n FROM orders",
    "count_by_filter_events": """
        SELECT count(*) AS n FROM events
        WHERE event_type = 'click' AND value >= 50.0
    """,
    "min_max_lineitem": """
        SELECT round(min(l_extendedprice), 6) AS mn,
               round(max(l_extendedprice), 6) AS mx
        FROM lineitem
    """,
    "table_hash_customer": f"""
        SELECT CAST(SUM(md5_number_lower(
            concat_ws('|',
                coalesce(CAST(c_custkey AS VARCHAR), '∅'),
                coalesce(CAST(c_name AS VARCHAR), '∅'),
                coalesce(CAST(c_nationkey AS VARCHAR), '∅'),
                coalesce(CAST(c_acctbal AS VARCHAR), '∅'),
                coalesce(CAST(c_mktsegment AS VARCHAR), '∅'))
        ) % {1_000_000_007}) AS BIGINT) AS table_hash
        FROM customer
    """,
    "hash_split_shard": """
        SELECT count(*) AS n, round(sum(l_quantity), 6) AS sum_qty
        FROM lineitem WHERE l_orderkey % 20 = 3
    """,
    "table_stats_orders": "SELECT count(*) AS num_rows FROM orders",
    "point_lookup_customer": """
        SELECT c_custkey, c_name, c_acctbal FROM customer
        WHERE c_custkey = 42 LIMIT 1
    """,
    "pk_range_boundaries_orders": """
        SELECT o_orderkey AS boundary FROM (
            SELECT o_orderkey,
                   row_number() OVER (ORDER BY o_orderkey) AS rn
            FROM orders
        ) WHERE (rn - 1) % 5000 = 0
        ORDER BY boundary
    """,
    "pk_range_boundaries_strings": """
        SELECT c_name AS boundary FROM (
            SELECT c_name,
                   row_number() OVER (ORDER BY c_name) AS rn
            FROM customer
        ) WHERE (rn - 1) % 25 = 0
        ORDER BY boundary
    """,
    "sample_stratified_documents": """
        SELECT lang, doc_id, CAST(rn AS BIGINT) AS rank FROM (
            SELECT lang, doc_id,
                   row_number() OVER (
                       PARTITION BY lang
                       ORDER BY md5_number_lower(CAST(doc_id AS VARCHAR)), doc_id
                   ) AS rn
            FROM documents
        ) WHERE rn <= 20
        ORDER BY lang, rank
    """,
    "json_props_agg": """
        SELECT event_type, count(*) AS n,
               CAST(sum(CAST(props->>'k' AS BIGINT)) AS BIGINT) AS sum_k
        FROM events GROUP BY event_type ORDER BY event_type
    """,
    "sample_mixture_documents": """
        WITH counts AS (SELECT lang, count(*) AS n FROM documents GROUP BY lang),
             m AS (SELECT min(n) AS min_n FROM counts)
        SELECT d.doc_id, d.lang
        FROM documents d JOIN counts c USING (lang) CROSS JOIN m
        WHERE (md5_number_lower(CAST(d.doc_id AS VARCHAR) || ':mix') % 1000) * c.n
              < m.min_n * 1000
    """,
    "source_sql_command": """
        WITH s AS (
            SELECT o_custkey, count(*) AS n_orders,
                   round(sum(o_totalprice), 6) AS total,
                   max(o_orderdate) AS last_order
            FROM orders GROUP BY o_custkey
        )
        SELECT o_custkey, n_orders, total, last_order,
               total / n_orders AS avg_price
        FROM s WHERE n_orders >= 3 ORDER BY o_custkey
    """,
    "distinct_segments": "SELECT DISTINCT c_mktsegment FROM customer ORDER BY 1",
    "master_subdoc_merge": """
        WITH li AS (
            SELECT l_orderkey,
                   string_agg(
                       '{"n":' || l_linenumber || ',"q":' || CAST(l_quantity AS BIGINT) || '}',
                       ',' ORDER BY l_linenumber) AS inner_json
            FROM lineitem GROUP BY l_orderkey
        )
        SELECT o.o_orderkey, o.o_custkey, '[' || li.inner_json || ']' AS lineitems
        FROM orders o JOIN li ON li.l_orderkey = o.o_orderkey
        ORDER BY o_orderkey
    """,
    "events_session_windows": """
        WITH e AS (
            SELECT user_id, ts,
                   CASE WHEN lag(ts) OVER w IS NULL
                             OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800000000
                        THEN 1 ELSE 0 END AS new_s
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts)
        ), s AS (
            SELECT user_id,
                   sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS UNBOUNDED PRECEDING) AS session
            FROM e
        ), per AS (
            SELECT user_id, session, count(*) AS n FROM s GROUP BY 1, 2
        )
        SELECT user_id, count(*) AS n_sessions, max(n) AS max_session_events
        FROM per GROUP BY user_id ORDER BY user_id
    """,
    "text_bigram_topk": """
        WITH toks AS (
            SELECT doc_id AS rid, string_split(lower(text), ' ') AS ws FROM documents
        ), words AS (
            SELECT rid, unnest(ws) AS w, unnest(range(1, len(ws) + 1)) AS i FROM toks
        ), bi AS (
            SELECT a.w || ' ' || b.w AS bigram
            FROM words a JOIN words b ON a.rid = b.rid AND b.i = a.i + 1
        )
        SELECT bigram, count(*) AS n FROM bi GROUP BY bigram
        ORDER BY n DESC, bigram LIMIT 20
    """,
    "quantiles_lineitem": """
        SELECT quantile_disc(l_quantity, 0.25) AS p25,
               quantile_disc(l_quantity, 0.5) AS p50,
               quantile_disc(l_quantity, 0.75) AS p75,
               quantile_disc(l_quantity, 0.95) AS p95
        FROM lineitem
    """,
    "profile_customer": """
        SELECT * FROM (
            SELECT 'c_acctbal' AS "column",
                   count(*) - count(c_acctbal) AS null_count,
                   count(DISTINCT c_acctbal) AS n_distinct,
                   CAST(min(c_acctbal) AS VARCHAR) AS min_val,
                   CAST(max(c_acctbal) AS VARCHAR) AS max_val
            FROM customer
            UNION ALL
            SELECT 'c_mktsegment', count(*) - count(c_mktsegment),
                   count(DISTINCT c_mktsegment),
                   CAST(min(c_mktsegment) AS VARCHAR),
                   CAST(max(c_mktsegment) AS VARCHAR)
            FROM customer
            UNION ALL
            SELECT 'c_nationkey', count(*) - count(c_nationkey),
                   count(DISTINCT c_nationkey),
                   CAST(min(c_nationkey) AS VARCHAR),
                   CAST(max(c_nationkey) AS VARCHAR)
            FROM customer
        ) ORDER BY "column"
    """,
    "lookup_enrich_customer": """
        SELECT c_custkey, c_name, c_acctbal, n_name AS nation, r_name AS region
        FROM customer
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
    """,
    "text_mask_documents": r"""
        SELECT doc_id,
               regexp_replace(text, '\b(customer|spark)\b', '<MASKED>', 'g')
                   AS text_masked,
               len(regexp_extract_all(text, '\b(customer|spark)\b')) AS n_masked
        FROM documents
    """,
    "sample_hash_documents": """
        SELECT doc_id, lang, n_chars
        FROM documents
        WHERE md5_number_lower(CAST(doc_id AS VARCHAR)) % 20 = 3
    """,
    "events_hopping_window": """
        WITH e AS (SELECT user_id, epoch_us(ts) AS us, value FROM events),
        x AS (
            SELECT user_id, (us // 300000000) * 300000000 AS win_start_us, value
            FROM e
            UNION ALL
            SELECT user_id, (us // 300000000) * 300000000 - 300000000, value
            FROM e
        )
        SELECT user_id, win_start_us, count(*) AS n_events,
               round(sum(value), 6) AS sum_value
        FROM x GROUP BY 1, 2
    """,
    # watermark + allowed lateness: arrival order = event_id, watermark =
    # strict-prefix max event time, late = ts < watermark - 30 min
    "events_window_late_data": """
        WITH ordered AS (
            SELECT ts, value,
                   max(ts) OVER (ORDER BY event_id
                                 ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND 1 PRECEDING) AS wm
            FROM events
        ), flagged AS (
            SELECT CAST(floor(epoch(ts) / 3600) AS BIGINT) AS win_hour, value,
                   (wm IS NOT NULL AND ts < wm - INTERVAL 30 MINUTE) AS is_late
            FROM ordered
        )
        SELECT win_hour,
               count(*) FILTER (WHERE NOT is_late) AS n_events,
               round(COALESCE(sum(value) FILTER (WHERE NOT is_late), 0), 6)
                   AS sum_value,
               count(*) FILTER (WHERE is_late) AS n_late
        FROM flagged GROUP BY 1
    """,
    "events_window_topk": """
        WITH c AS (
            SELECT CAST(floor(epoch(ts) / 3600) AS BIGINT) AS win_hour,
                   event_type, count(*) AS n_events
            FROM events GROUP BY 1, 2
        ), r AS (
            SELECT *, row_number() OVER (
                PARTITION BY win_hour ORDER BY n_events DESC, event_type
            ) AS rank FROM c
        )
        SELECT win_hour, event_type, n_events, CAST(rank AS BIGINT) AS rank
        FROM r WHERE rank <= 3
    """,
    "events_tumbling_window": """
        SELECT user_id,
               CAST(floor(epoch(ts) / 3600) AS BIGINT) AS win_hour,
               count(*) AS n_events,
               round(sum(value), 6) AS sum_value
        FROM events
        GROUP BY 1, 2
    """,
    # incremental == batch: the three-epoch ledger union must equal the
    # one-shot window aggregate
    "events_window_incremental": """
        SELECT user_id,
               CAST(floor(epoch(ts) / 3600) AS BIGINT) AS win_hour,
               count(*) AS n_events,
               round(sum(value), 6) AS sum_value
        FROM events
        GROUP BY 1, 2
    """,
    "events_asof_join": """
        WITH r AS (
            SELECT user_id, ts, event_id, value,
                   row_number() OVER (PARTITION BY user_id, ts
                                      ORDER BY event_id DESC) AS rn
            FROM events WHERE event_type = 'view'
        ), rd AS (
            SELECT user_id, ts, event_id, value FROM r WHERE rn = 1
        )
        SELECT l.event_id, l.user_id, l.ts,
               CAST(rd.event_id AS DOUBLE) AS view_event_id,
               rd.value AS view_value
        FROM (SELECT * FROM events WHERE event_type = 'purchase') l
        ASOF LEFT JOIN rd ON l.user_id = rd.user_id AND l.ts >= rd.ts
    """,
    "events_follow_within": """
        SELECT l.event_id, count(r.event_id) AS n_follow
        FROM events l LEFT JOIN events r
          ON r.user_id = l.user_id
         AND r.ts > l.ts AND r.ts <= l.ts + INTERVAL 5 MINUTE
        GROUP BY l.event_id
    """,
}


def q_master_subdoc_merge(sf_dir: str):
    """Master/sub-document merge (``upsertMerge`` SPI — merge child rows
    into an embedded array of the master doc; reference:
    ``connectors/mongodb-connector/.../merge/Merge.java:8-25``,
    ``entity/MergeBundle.java:82``): lineitem rows fold into a per-order
    JSON array ordered by line number, joined onto the orders master.

    Ray shape: coarse-bucket groupby of the child table (one vectorized
    pandas fold per bucket — NOT a per-order grouped aggregate, which pays
    per-group overhead across 10^4+ orders), then a distributed hash join
    onto the master.  Child fields are integers so the embedded JSON is
    byte-identical across engines."""
    child = ray.data.read_parquet(
        _t(sf_dir, "lineitem"), columns=["l_orderkey", "l_linenumber", "l_quantity"]
    )

    def bucket(batch: pa.Table) -> pa.Table:
        k = batch["l_orderkey"].to_numpy(zero_copy_only=False)
        return batch.append_column("obucket", pa.array((k % 256).astype(np.int32)))

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values(["l_orderkey", "l_linenumber"], kind="stable")
        frag = (
            '{"n":' + df["l_linenumber"].astype(np.int64).astype(str)
            + ',"q":' + df["l_quantity"].astype(np.int64).astype(str) + "}"
        )
        inner = frag.groupby(df["l_orderkey"].to_numpy()).agg(",".join)
        return pd.DataFrame(
            {"o_orderkey": inner.index.to_numpy(), "lineitems": "[" + inner + "]"}
        ).reset_index(drop=True)

    docs = (
        child.map_batches(bucket, batch_format="pyarrow", zero_copy_batch=True)
        .groupby("obucket")
        .map_groups(fold, batch_format="pandas")
    )
    from tapdata_connectors_ray.fixtures import parquet_num_rows
    from tapdata_connectors_ray.functions.sizing import join_partitions

    master = ray.data.read_parquet(_t(sf_dir, "orders"), columns=["o_orderkey", "o_custkey"])
    return master.join(
        docs,
        join_type="inner",
        num_partitions=join_partitions(parquet_num_rows(_t(sf_dir, "orders"))),
        on=("o_orderkey",),
    )


def relational_oracle_sql() -> dict[str, str]:
    """Static SQL plus the typelattice expectation: every portable type
    must round-trip, rendered as a VALUES table over the lattice's type
    names (the EveryTapValueToTargetTest pass criterion)."""
    out = dict(RELATIONAL_SQL)
    from tapdata_connectors_ray.functions.codecs import lattice_sample_table

    names = lattice_sample_table(4).schema.names
    values = ", ".join(f"('{n}', 256, TRUE)" for n in names)
    out["typelattice_roundtrip"] = (
        f"SELECT * FROM (VALUES {values}) AS t(tap_type, n_values, roundtrip_ok) "
        "ORDER BY tap_type"
    )
    return out


def relational_queries():
    return {
        "af_lineitem_filter_sort_limit": q_af_lineitem_filter_sort_limit,
        "af_customer_match": q_af_customer_match,
        "batch_count_orders": q_batch_count_orders,
        "count_by_filter_events": q_count_by_filter_events,
        "min_max_lineitem": q_min_max_lineitem,
        "table_hash_customer": q_table_hash_customer,
        "hash_split_shard": q_hash_split_shard,
        "table_stats_orders": q_table_stats_orders,
        "point_lookup_customer": q_point_lookup_customer,
        "pk_range_boundaries_orders": q_pk_range_boundaries_orders,
        "pk_range_boundaries_strings": q_pk_range_boundaries_strings,
        "source_sql_command": q_source_sql_command,
        "sample_stratified_documents": q_sample_stratified_documents,
        "sample_mixture_documents": q_sample_mixture_documents,
        "json_props_agg": q_json_props_agg,
        "distinct_segments": q_distinct_segments,
        "quantiles_lineitem": q_quantiles_lineitem,
        "profile_customer": q_profile_customer,
        "text_mask_documents": q_text_mask_documents,
        "lookup_enrich_customer": q_lookup_enrich_customer,
        "sample_hash_documents": q_sample_hash_documents,
        "events_hopping_window": q_events_hopping_window,
        "events_tumbling_window": q_events_tumbling_window,
        "events_window_incremental": q_events_window_incremental,
        "events_window_late_data": q_events_window_late_data,
        "events_window_topk": q_events_window_topk,
        "events_session_windows": q_events_session_windows,
        "events_asof_join": q_events_asof_join,
        "events_follow_within": q_events_follow_within,
        "text_bigram_topk": q_text_bigram_topk,
        "typelattice_roundtrip": q_typelattice_roundtrip,
        "master_subdoc_merge": q_master_subdoc_merge,
    }
