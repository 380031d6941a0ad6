"""Property test: the vectorized field-level patch fold (``stages/patch.py``)
equals a sequential document-store apply ($set of present fields, $unset of
removedFields, in LSN order) on arbitrary little patch logs.
"""

from __future__ import annotations

import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from tapdata_connectors_ray.stages.patch import make_patch_fold

KEYS = [("c-a", 0), ("c-a", 1), ("c-b", 0)]
FIELDS = {"p_role": "role", "p_score": "score"}


@st.composite
def patch_logs(draw):
    n = draw(st.integers(min_value=1, max_value=30))
    rows = []
    for lsn in range(1, n + 1):
        conv, turn = draw(st.sampled_from(KEYS))
        set_role = draw(st.booleans())
        set_score = draw(st.booleans())
        unsets = []
        if not set_role and draw(st.booleans()):
            unsets.append("role")
        if not set_score and draw(st.booleans()):
            unsets.append("score")
        rows.append(
            {
                "lsn": lsn,
                "conv_id": conv,
                "turn_idx": turn,
                "p_role": f"r{draw(st.integers(0, 3))}" if set_role else None,
                "p_score": draw(st.integers(0, 9)) if set_score else None,
                "unset_cols": ",".join(unsets) if unsets else None,
            }
        )
    return pd.DataFrame(rows)


def sequential_apply(df: pd.DataFrame) -> dict:
    docs: dict = {}
    for row in df.sort_values("lsn").itertuples():
        doc = docs.setdefault((row.conv_id, row.turn_idx), {})
        if row.p_role is not None:
            doc["role"] = row.p_role
        if row.p_score is not None and not pd.isna(row.p_score):
            doc["score"] = int(row.p_score)
        for f in (row.unset_cols or "").split(","):
            doc.pop(f, None)
    return docs


@given(patch_logs())
@settings(max_examples=60, deadline=None)
def test_patch_fold_matches_sequential_apply(df):
    fold = make_patch_fold(["conv_id", "turn_idx"], FIELDS, {"p_score"})
    got = fold(df.copy())
    exp = sequential_apply(df)
    assert len(got) == len(exp)
    for row in got.itertuples():
        doc = exp[(row.conv_id, row.turn_idx)]
        assert (None if row.p_role is None else row.p_role) == doc.get("role")
        g_score = None if pd.isna(row.p_score) else int(row.p_score)
        assert g_score == doc.get("score")
