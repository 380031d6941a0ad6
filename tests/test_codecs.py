"""Type-lattice codec round-trip (the ``EveryTapValueToTargetTest``
analogue, survey §5 v3): every portable type survives the
encode-for-target / decode-from-target cycle exactly, nulls included,
including through a Ray map_batches pass."""

import pyarrow as pa

from tapdata_connectors_ray.functions.codecs import (
    TAP_TO_ARROW,
    decode_from_target,
    encode_for_target,
    lattice_sample_table,
)


def test_every_type_roundtrips_exactly():
    t = lattice_sample_table(64)
    enc = encode_for_target(t, t.schema)
    # the target dialect is strings/numbers only (JSON-text convention)
    for f in enc.schema:
        assert (
            pa.types.is_string(f.type)
            or pa.types.is_integer(f.type)
            or pa.types.is_floating(f.type)
        ), f.name
    dec = decode_from_target(enc, t.schema)
    assert dec.equals(t), "lossy codec round-trip"


def test_roundtrip_through_ray_pipeline(ray_session):
    import ray.data

    t = lattice_sample_table(256)
    schema = t.schema

    def encode(batch: pa.Table) -> pa.Table:
        return encode_for_target(batch, schema)

    def decode(batch: pa.Table) -> pa.Table:
        return decode_from_target(batch, schema)

    out = (
        ray.data.from_arrow(t)
        .map_batches(encode, batch_format="pyarrow")
        .map_batches(decode, batch_format="pyarrow")
        .take_all()
    )
    assert len(out) == t.num_rows
    got = pa.Table.from_pylist(out, schema=schema)
    # row order is preserved for a single-block dataset
    assert got.equals(t)


def test_lattice_covers_survey_mapping():
    names = set(TAP_TO_ARROW)
    assert {"TapString", "TapBoolean", "TapBinary", "TapDate", "TapTime",
            "TapDateTime", "TapYear", "TapArray", "TapMap"} <= names
