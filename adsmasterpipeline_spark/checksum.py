"""Checksum-based change suppression (F15, `adsmp/app.py:594-626`).

The reference computes ``hex(crc32(canonical_json) & 0xffffffff)`` over
a payload dict with (a) keys sorted and (b) any key containing
``mtime``/``ctime``/``update_timestamp`` dropped, so that re-indexing
an unchanged record produces the same checksum and the sink write is
skipped (`adsmp/tasks.py:404-409`).

Spark-side we need *self-consistency*, not bit-parity with CPython:
a checksum column computed twice over the same logical content must be
equal. Two implementations:

- ``checksum_col``: pure-JVM ``crc32(to_json(struct))`` — struct field
  order is schema-fixed, so the serialization is canonical by
  construction. Volatile fields are dropped by NOT including them in
  the struct.
- ``canonical_checksum_udf``: Arrow-batched Pandas UDF reproducing the
  reference's sorted-keys + volatile-key-drop semantics over raw JSON
  strings (for payloads with dynamic schema).
"""

from __future__ import annotations

import json
import zlib

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T

VOLATILE_KEY_MARKERS = ("mtime", "ctime", "update_timestamp")


def checksum_col(struct: Column) -> Column:
    """CRC32 checksum of a struct column, rendered like the reference
    (CPython ``hex()``): ``0x`` + lowercase hex, e.g. ``0x4db9106``.
    ``F.hex`` of a long never zero-pads, so no stripping — and crc 0
    renders ``0x0``, not ``0x``."""
    return F.concat(
        F.lit("0x"),
        F.lower(F.hex(F.crc32(F.to_json(struct).cast("binary")))),
    )


def canonical_json(payload: dict) -> str:
    """Driver/UDF-side canonicalizer: drop volatile keys (recursively at
    the top level, like the reference), sort keys."""
    clean = {
        k: v for k, v in payload.items()
        if not any(m in k for m in VOLATILE_KEY_MARKERS)
    }
    return json.dumps(clean, sort_keys=True, separators=(",", ":"))


def crc32_hex(s: str) -> str:
    return hex(zlib.crc32(s.encode("utf-8")) & 0xFFFFFFFF)


@F.pandas_udf(T.StringType())
def canonical_checksum_udf(payload_json: pd.Series) -> pd.Series:
    """Checksum of a raw-JSON payload column with reference semantics
    (sorted keys, volatile keys dropped). Arrow-batched."""
    def one(s):
        if s is None:
            return None
        try:
            return crc32_hex(canonical_json(json.loads(s)))
        except (ValueError, TypeError, AttributeError):
            return crc32_hex(s)
    return payload_json.map(one)
