"""Canonical schemas + JSON (de)serialization for pyarrow types.

The reference declares a fixed StructType per table and coerces every batch to
it (ref: src/elt/silver/_silver_handler.py:44-55, transform_daily_ohlcv.py:11-20).
We do the same with a canonical `pyarrow.Schema` and a vectorized normalizer
(see raylake/functions/cleaning.py:normalize_schema).

Only primitive types (+ list<float32> for embeddings, binary for multimodal
payloads) are supported — matching the reference's type universe (SURVEY §1.2).
"""

from __future__ import annotations

import pyarrow as pa

# The primary table shape (BASELINE.json input_hint): multi-turn transcripts.
TRANSCRIPT_SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("role", pa.string()),
        ("text", pa.string()),
        ("tool", pa.string()),
        ("ts", pa.timestamp("us")),
    ]
)

_TYPE_TO_STR = {
    pa.string(): "string",
    pa.large_string(): "large_string",
    pa.int8(): "int8",
    pa.int16(): "int16",
    pa.int32(): "int32",
    pa.int64(): "int64",
    pa.uint32(): "uint32",
    pa.uint64(): "uint64",
    pa.float32(): "float32",
    pa.float64(): "float64",
    pa.bool_(): "bool",
    pa.date32(): "date32",
    pa.timestamp("us"): "timestamp[us]",
    pa.timestamp("ms"): "timestamp[ms]",
    pa.timestamp("s"): "timestamp[s]",
    pa.timestamp("ns"): "timestamp[ns]",
    pa.binary(): "binary",
    pa.large_binary(): "large_binary",
    pa.list_(pa.float32()): "list<float32>",
    pa.list_(pa.float64()): "list<float64>",
}
_STR_TO_TYPE = {v: k for k, v in _TYPE_TO_STR.items()}


def type_to_str(t: pa.DataType) -> str:
    try:
        return _TYPE_TO_STR[t]
    except KeyError:
        raise TypeError(f"unsupported type for raylake schema: {t!r}")


def str_to_type(s: str) -> pa.DataType:
    try:
        return _STR_TO_TYPE[s]
    except KeyError:
        raise TypeError(f"unknown raylake type string: {s!r}")


def schema_to_json(schema: pa.Schema) -> list[list[str]]:
    return [[f.name, type_to_str(f.type)] for f in schema]


def schema_from_json(fields: list[list[str]]) -> pa.Schema:
    return pa.schema([(name, str_to_type(ts)) for name, ts in fields])
