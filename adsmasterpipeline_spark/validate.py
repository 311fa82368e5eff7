"""Differential validation (J5/F18; adsmp/validate.py:53-233,
scripts/compare_solrs.py:104-161).

Compares two search-doc DataFrames field-by-field on the bibcode key
with the reference's tolerance rules:

- list fields: sorted-equal
- `citation_count`-style counts: absolute tolerance (±3)
- `cite_read_boost`-style floats: relative tolerance (±10%)
- text fields: similarity ratio ≥ 0.8 (difflib SequenceMatcher — the
  one genuinely Python-native comparison; Arrow-batched Pandas UDF)
- everything else: exact
"""

from __future__ import annotations

from dataclasses import dataclass, field

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


@dataclass
class Tolerances:
    count_abs: dict = field(default_factory=lambda: {"citation_count": 3})
    float_rel: dict = field(default_factory=lambda: {"cite_read_boost": 0.1})
    text_sim: dict = field(default_factory=lambda: {"abstract": 0.8,
                                                    "body": 0.8})
    count_only: tuple = ("reference",)  # compare len() not content


@F.pandas_udf(T.DoubleType())
def _similarity(a: pd.Series, b: pd.Series) -> pd.Series:
    from difflib import SequenceMatcher

    def ratio(x, y):
        if x is None and y is None:
            return 1.0
        if x is None or y is None:
            return 0.0
        return SequenceMatcher(None, x, y).ratio()
    return pd.Series([ratio(x, y) for x, y in zip(a, b)])


def compare(left: DataFrame, right: DataFrame, key: str = "bibcode",
            fields: list[str] | None = None,
            tol: Tolerances | None = None) -> DataFrame:
    """Full-outer join on the key; one row per (key, field) mismatch.
    Matching rows produce no output — an empty result means equal."""
    tol = tol or Tolerances()
    fields = fields or [c for c in left.columns
                        if c != key and c in right.columns]
    l = left.select(key, *[F.col(c).alias(f"l_{c}") for c in fields])
    r = right.select(key, *[F.col(c).alias(f"r_{c}") for c in fields])
    j = l.join(r, key, "full_outer")

    ldt = dict(left.dtypes)
    checks = []
    for c in fields:
        lc, rc = F.col(f"l_{c}"), F.col(f"r_{c}")
        if c in tol.count_only:
            ok = F.coalesce(F.size(lc), F.lit(-1)) == \
                F.coalesce(F.size(rc), F.lit(-1))
        elif c in tol.count_abs:
            ok = F.abs(F.coalesce(lc, F.lit(0)) - F.coalesce(rc, F.lit(0))) \
                <= tol.count_abs[c]
        elif c in tol.float_rel:
            rel = tol.float_rel[c]
            ok = (F.abs(F.coalesce(lc, F.lit(0.0)) - F.coalesce(rc, F.lit(0.0)))
                  <= F.abs(F.coalesce(rc, F.lit(0.0))) * rel + 1e-12)
        elif c in tol.text_sim:
            ok = _similarity(lc, rc) >= tol.text_sim[c]
        elif ldt.get(c, "").startswith("array"):
            ok = F.coalesce(F.sort_array(lc) == F.sort_array(rc),
                            lc.isNull() & rc.isNull())
        else:
            ok = F.coalesce(lc == rc, lc.isNull() & rc.isNull())
        checks.append(
            F.when(~ok, F.struct(
                F.lit(c).alias("field"),
                lc.cast("string").alias("left"),
                rc.cast("string").alias("right"))))

    return (
        j.select(key, F.explode(F.filter(F.array(*checks),
                                         lambda x: x.isNotNull())).alias("d"))
        .select(key, "d.field", "d.left", "d.right")
    )
