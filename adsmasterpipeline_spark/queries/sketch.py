"""Probabilistic-sketch operators, deterministic-hash form: a
Count-Min sketch whose cells are exact integers built from md5-derived
bucket functions, so BOTH engines reproduce the sketch bit-for-bit and
the estimate/exact comparison is oracle-checkable (unlike
approx_count_distinct / datasketches, whose internals are
engine-specific and register rows-only at best).

Public algorithm: Cormode & Muthukrishnan 2005, "An improved data
stream summary: the count-min sketch and its applications". No
reference analogue (training-data/analytics extension per the brief).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources import load_table
from . import query
from .text import _NORM_SQL, _norm_text

_D, _W = 4, 64  # sketch depth (hash rows) and width (buckets)

_HEX = "0123456789abcdef"


def _bucket_sql(j: int, tok: str) -> str:
    """Bucket = last-two-hex-digit value of md5(j|tok) mod width —
    written digit-math style because DuckDB has no base-16 conv()."""
    h = f"md5('{j}|' || {tok})"
    return (f"((strpos('{_HEX}', substr({h}, 31, 1)) - 1) * 16 "
            f"+ strpos('{_HEX}', substr({h}, 32, 1)) - 1) % {_W}"
            )


def _bucket(j: int, tok) -> F.Column:
    h = F.md5(F.concat(F.lit(f"{j}|"), tok))
    return F.conv(F.substring(h, 31, 2), 16, 10).cast("long") % _W


@query(
    "countmin_heavy_hitters",
    f"""
    WITH toks AS (
      SELECT tok FROM (
        SELECT unnest(string_split({_NORM_SQL}, ' ')) AS tok
        FROM documents
      ) WHERE tok <> ''
    ),
    cnt AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS c
            FROM toks GROUP BY tok),
    top AS (SELECT tok, c FROM cnt ORDER BY c DESC, tok LIMIT 20),
    cells AS (
      SELECT r.j AS j,
             CASE r.j
               {' '.join(f"WHEN {j} THEN {_bucket_sql(j, 'tok')}"
                         for j in range(_D))}
             END AS b
      FROM toks, range(0, {_D}) r(j)
    ),
    sk AS (SELECT j, b, CAST(COUNT(*) AS BIGINT) AS cell
           FROM cells GROUP BY j, b),
    probes AS (
      SELECT t.tok, t.c, r.j AS j,
             CASE r.j
               {' '.join(f"WHEN {j} THEN {_bucket_sql(j, 't.tok')}"
                         for j in range(_D))}
             END AS b
      FROM top t, range(0, {_D}) r(j)
    )
    SELECT p.tok, p.c AS exact_cnt,
           CAST(MIN(sk.cell) AS BIGINT) AS cms_est,
           CAST(MIN(sk.cell) - p.c AS BIGINT) AS overcount
    FROM probes p JOIN sk ON sk.j = p.j AND sk.b = p.b
    GROUP BY p.tok, p.c
    """,
    "textops", "scale",
    doc="Count-Min sketch heavy hitters (Cormode-Muthukrishnan 2005): "
        f"a {_D}x{_W} sketch over the corpus token stream (bucket = "
        "md5-derived, identical in both engines), probed for the exact "
        "top-20 tokens; cms_est >= exact_cnt always (CMS only "
        "overcounts), and overcount shows the epsilon*N error the "
        f"{_W}-bucket width buys. Scale shape: the sketch is a "
        f"map-side-combinable aggregate onto {_D}*{_W} = {_D * _W} "
        "cells — CONSTANT-size state no matter the corpus (the whole "
        "point of a sketch at 100 TB: one tiny broadcastable summary "
        "instead of a vocabulary-sized count table); the top-20 probe "
        "set is distributed TopK (TakeOrderedAndProject) and the "
        "probe join touches 20 x 4 rows. The exact count table exists "
        "here only to MEASURE the sketch's error; production reads "
        "estimates straight off the 256 cells.",
)
def countmin_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    toks = (d.select(F.explode(F.split(_norm_text(), " ")).alias("tok"))
            .where(F.col("tok") != ""))
    cnt = toks.groupBy("tok").agg(F.count(F.lit(1)).cast("long").alias("c"))
    top = cnt.orderBy(F.col("c").desc(), "tok").limit(20)
    cells = toks.select(F.explode(F.array(*[
        F.struct(F.lit(j).alias("j"),
                 _bucket(j, F.col("tok")).alias("b"))
        for j in range(_D)])).alias("jb")).select("jb.j", "jb.b")
    sk = (cells.groupBy("j", "b")
          .agg(F.count(F.lit(1)).cast("long").alias("cell")))
    probes = top.select("tok", "c", F.explode(F.array(*[
        F.struct(F.lit(j).alias("j"),
                 _bucket(j, F.col("tok")).alias("b"))
        for j in range(_D)])).alias("jb")).select("tok", "c",
                                                  "jb.j", "jb.b")
    return (probes.join(F.broadcast(sk), ["j", "b"])
            .groupBy("tok", "c")
            .agg(F.min("cell").alias("cms_est"))
            .select("tok", F.col("c").alias("exact_cnt"),
                    F.col("cms_est").cast("long"),
                    (F.col("cms_est") - F.col("c")).cast("long")
                    .alias("overcount")))
