"""Data-layout queries over ``operators/layout.py``: Z-order
clustering stats, oracle-checked bit-for-bit (Morton encoding is pure
integer arithmetic, identical in any engine)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators.layout import skipping_stats
from ..sources import load_table
from . import query


def _spread_sql(src: str, out: str) -> str:
    """One magic-number spread stage chain as nested SQL (16-bit value
    into even bits of 32). Mirrors operators/layout._spread16."""
    e = f"({src} & 65535)"
    for mask, shift in ((0x00FF00FF, 8), (0x0F0F0F0F, 4),
                        (0x33333333, 2), (0x55555555, 1)):
        e = f"(({e} | ({e} << {shift})) & {mask})"
    return f"{e} AS {out}"


@query(
    "zorder_data_skipping",
    f"""
    WITH n AS (
      SELECT l_partkey, l_suppkey,
             CAST(FLOOR(l_partkey * 65535 /
                        (SELECT MAX(l_partkey) FROM lineitem)) AS BIGINT) AS na,
             CAST(FLOOR(l_suppkey * 65535 /
                        (SELECT MAX(l_suppkey) FROM lineitem)) AS BIGINT) AS nb
      FROM lineitem),
    z AS (
      SELECT l_partkey, l_suppkey,
             {_spread_sql('na', 'sa')},
             {_spread_sql('nb', 'sb')}
      FROM n),
    zz AS (SELECT l_partkey, l_suppkey, (sa | (sb << 1)) AS zvalue FROM z)
    SELECT CAST(zvalue >> 26 AS INT) AS zbucket,
           COUNT(*) AS n_rows,
           MIN(l_partkey) AS min_l_partkey, MAX(l_partkey) AS max_l_partkey,
           MIN(l_suppkey) AS min_l_suppkey, MAX(l_suppkey) AS max_l_suppkey
    FROM zz GROUP BY CAST(zvalue >> 26 AS INT)
    """,
    "layout", "scale",
    doc="Z-order layout stats (operators/layout.skipping_stats): rows "
        "bucketed by the top 6 bits of the Morton code of (partkey, "
        "suppkey); per-bucket min/max of BOTH keys are the file stats "
        "a lakehouse persists for data skipping. Every bucket covers a "
        "bounded rectangle, so filters on either column prune buckets "
        "— single-column sorting only prunes one. Assignment is a "
        "narrow integer expression: no sampling, no global sort.",
)
def zorder_data_skipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    return skipping_stats(li, "l_partkey", "l_suppkey", bucket_bits=6)
