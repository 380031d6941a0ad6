"""Partial-update (patch) merge: field-level LWW.

The reference's MongoDB writer applies updates as ``$set`` of only the
fields present in the event plus ``$unset`` of ``removedFields``
(``MongodbWriter.java:380-432``) — so the final document folds PER FIELD,
not per row: each field independently takes the value from the latest
event that set it, unless a later event unset it.  Row-level LWW
(``stages/merge.py``) cannot express this.

Event encoding (the patch log produced by ``fixtures.ensure_patch_fixture``):
one row per patch with key columns always present, one nullable column per
patchable field (NULL = field absent from this patch), and ``unset_cols`` —
a comma-joined list of fields this patch removes (``removedFields``).

Fold = per (key, field): sentinel-encode "unset" as a reserved string, then
take the LAST NON-NULL value in LSN order — exactly DuckDB's
``last_value(expr IGNORE NULLS)`` window, and exactly pandas
``GroupBy.last()`` (which skips nulls), so the engine and the SQL oracle
share one fold definition.  Distribution shape matches the LWW merge: one
hash shuffle on ``partition_id``, per-group vectorized fold, no driver
state.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

# reserved marker: "this field was explicitly unset here" (distinct from
# NULL = "this patch does not touch the field"); folds like a value, decodes
# to NULL at the end.  \x01 so the DuckDB twin can build it with chr(1)
# (varchar rejects NUL bytes); control bytes cannot appear in fixture text.
UNSET_SENTINEL = "\x01UNSET"


def make_patch_fold(
    key_cols: list[str], fields: dict[str, str], int_fields: set[str]
):
    """Per-partition-group fold: patches (sorted by lsn) -> one row per key
    with field-level last-writer-wins incl. unsets.

    ``fields`` maps patch COLUMN name -> logical field name as it appears in
    ``unset_cols`` (removedFields uses logical names, e.g. ``tool``, while
    the patch log prefixes set-columns, e.g. ``p_tool``)."""

    def fold(df: pd.DataFrame) -> pd.DataFrame:
        df = df.sort_values("lsn", kind="stable")
        # ",a,b," wrapper turns list membership into a vectorized substring test
        wrapped = ("," + df["unset_cols"].fillna("") + ",").to_numpy()
        out: dict[str, object] = {}
        for f, logical in fields.items():
            s = df[f]
            if f in int_fields:  # fold in string space so the sentinel fits
                s = s.astype("Int64").astype("string").astype(object)
                s = s.where(s.notna(), None)
            unset_here = np.char.find(wrapped.astype(str), f",{logical},") >= 0
            s = s.where(~unset_here, UNSET_SENTINEL)
            out[f] = s
        # pandas GroupBy.last() skips nulls == last_value IGNORE NULLS
        work = pd.DataFrame({**{k: df[k] for k in key_cols}, **out})
        folded = work.groupby(key_cols, sort=True, dropna=False).last().reset_index()
        for f in fields:
            col = folded[f].where(folded[f] != UNSET_SENTINEL, None)
            if f in int_fields:
                folded[f] = pd.array(col, dtype="Int64")
            else:
                folded[f] = col.astype("object")
        return folded

    return fold
