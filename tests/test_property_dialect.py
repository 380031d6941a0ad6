"""Property test: CsvReadOptions' dialect mapping round-trips arbitrary cell
content (separators, quotes, unicode) bit-exactly through Arrow CSV bytes —
the contract behind every storage backend's CSV path."""

from __future__ import annotations

import io

import pyarrow as pa
import pyarrow.csv as pacsv
from hypothesis import given, settings
from hypothesis import strategies as st

from tapdata_connectors_ray.sources.files import CsvReadOptions

cell = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",), blacklist_characters="\r\x00"),
    max_size=12,
)


@settings(max_examples=60, deadline=None)
@given(
    rows=st.lists(st.tuples(st.integers(-10**9, 10**9), cell), min_size=1, max_size=8),
    sep=st.sampled_from([",", ";", "\t", "|"]),
)
def test_dialect_roundtrip(rows, sep):
    table = pa.table(
        {
            "k": pa.array([r[0] for r in rows], pa.int64()),
            "v": pa.array([r[1] for r in rows], pa.string()),
        }
    )
    buf = io.BytesIO()
    pacsv.write_csv(table, buf, pacsv.WriteOptions(delimiter=sep))
    opts = CsvReadOptions(separator=sep)
    schema = pa.schema([("k", pa.int64()), ("v", pa.string())])
    back = pacsv.read_csv(io.BytesIO(buf.getvalue()), **opts.arrow_args(schema))
    # Arrow CSV cannot distinguish empty string from null on read-back —
    # normalize both sides to "" (the reference's justString contract)
    import pyarrow.compute as pc

    got = pc.fill_null(back["v"], "").to_pylist()
    exp = pc.fill_null(table["v"], "").to_pylist()
    assert back["k"].to_pylist() == table["k"].to_pylist()
    assert got == exp
