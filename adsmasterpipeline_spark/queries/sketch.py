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
    # fold the stream to per-token exact counts FIRST and pin THAT: the
    # count table is needed for the output anyway, it is vocabulary-
    # sized (not corpus-sized, so the pin is tiny), and the sketch cell
    # `COUNT(*) by (j,b)` over occurrences equals `SUM(c) by (j,b)`
    # over distinct tokens exactly (integer sums commute) — so the 4
    # md5 bucket hashes run once per DISTINCT token instead of once
    # per token OCCURRENCE, and the cells explode fans out vocab rows,
    # not corpus rows.
    cnt = (toks.groupBy("tok")
           .agg(F.count(F.lit(1)).cast("long").alias("c"))
           ).localCheckpoint()
    top = cnt.orderBy(F.col("c").desc(), "tok").limit(20)
    cells = cnt.select("c", F.explode(F.array(*[
        F.struct(F.lit(j).alias("j"),
                 _bucket(j, F.col("tok")).alias("b"))
        for j in range(_D)])).alias("jb")).select("c", "jb.j", "jb.b")
    sk = (cells.groupBy("j", "b")
          .agg(F.sum("c").cast("long").alias("cell")))
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


def _hex_int_sql(h: str, start: int, n: int) -> str:
    """Value of n hex chars of ``h`` starting at 1-based ``start`` —
    digit-fold form (DuckDB has no base-16 conv())."""
    terms = " + ".join(
        f"(strpos('{_HEX}', substr({h}, {start + i}, 1)) - 1) "
        f"* {16 ** (n - 1 - i)}"
        for i in range(n))
    return f"({terms})"


_HLL_M = 64          # registers (2^6)
#: alpha_64 — write the same literal arithmetic in both engines so the
#: doubles match bit-for-bit
_HLL_ALPHA_SQL = "0.7213 / (1 + 1.079 / 64)"


@query(
    "hll_distinct_tokens",
    f"""
    WITH toks AS (
      SELECT lang, tok FROM (
        SELECT lang, unnest(string_split({_NORM_SQL}, ' ')) AS tok
        FROM documents
      ) WHERE tok <> ''
    ),
    h AS (
      SELECT lang, tok,
             {_hex_int_sql("md5(tok)", 31, 2)} % {_HLL_M} AS idx,
             {_hex_int_sql("md5(tok)", 1, 8)} AS v
      FROM toks
    ),
    regs AS (
      SELECT lang, idx,
             MAX(CASE WHEN v = 0 THEN 33
                 ELSE 32 - CAST(FLOOR(LOG2(CAST(v AS DOUBLE))) AS BIGINT)
                 END) AS m
      FROM h GROUP BY lang, idx
    ),
    sums AS (
      SELECT lang,
             SUM(POWER(2.0, -CAST(m AS DOUBLE))) AS s,
             COUNT(*) AS n_regs
      FROM regs GROUP BY lang
    ),
    exact AS (
      SELECT lang, CAST(COUNT(DISTINCT tok) AS BIGINT) AS exact_distinct
      FROM toks GROUP BY lang
    ),
    est AS (
      -- raw estimator + the standard small-range linear-counting
      -- correction: raw <= 2.5m with V empty registers -> m*ln(m/V)
      SELECT lang,
             CASE WHEN {_HLL_ALPHA_SQL} * {_HLL_M} * {_HLL_M}
                       / (s + ({_HLL_M} - n_regs)) <= 2.5 * {_HLL_M}
                       AND n_regs < {_HLL_M}
                  THEN {_HLL_M} * LN(CAST({_HLL_M} AS DOUBLE)
                                     / ({_HLL_M} - n_regs))
                  ELSE {_HLL_ALPHA_SQL} * {_HLL_M} * {_HLL_M}
                       / (s + ({_HLL_M} - n_regs)) END AS e
      FROM sums
    )
    SELECT x.lang, x.exact_distinct,
           CAST(FLOOR(est.e) AS BIGINT) AS hll_est,
           CAST(FLOOR(ABS(est.e - x.exact_distinct) * 1000000.0
                      / x.exact_distinct) AS BIGINT) AS err_ppm
    FROM exact x JOIN est ON x.lang = est.lang
    """,
    "textops", "scale",
    doc="HyperLogLog distinct-token cardinality per language (Flajolet "
        f"et al. 2007), deterministic-hash form: {_HLL_M} registers, "
        "register = md5 tail bits, rank = leading zeros of a 32-bit "
        "md5 prefix (rho via FLOOR(LOG2) — exact for 32-bit values; "
        "the 48-bit form can round across the floor boundary). "
        "Cross-engine determinism: every 2^-M term is an exact power "
        "of two spanning <= 33 bits, so the register sum is EXACT in "
        "double regardless of summation order, and the alpha constant "
        "is written as the same literal arithmetic in both engines. "
        "Scale shape: one pass, max-aggregated onto <= 64 cells per "
        "group — constant-size mergeable state (the HLL contract: "
        "union = register-wise max), the exact COUNT DISTINCT exists "
        "only to MEASURE the sketch error. The standard small-range "
        "linear-counting correction (raw <= 2.5m with V empty "
        "registers -> m*ln(m/V)) applies in both engines — the "
        "synthetic per-language vocabulary sits in that regime, where "
        "raw HLL overestimates ~2x and linear counting is near-exact. "
        "Companion to "
        "countmin_heavy_hitters: cardinality sketch + frequency "
        "sketch. Spark's native approx_count_distinct is the same "
        "algorithm engine-side; this form is the ORACLE-CHECKABLE "
        "twin (distinct_counts_exact_vs_approx covers the native "
        "one rows-only).",
)
def hll_distinct_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    # fold the occurrence stream to DISTINCT (lang, tok) FIRST and pin
    # that (the countmin move): both consumers are duplicate-invariant
    # — the register build is max(rho) per (lang, idx) and the twin is
    # COUNT DISTINCT — so the pinned table is vocabulary-sized, not
    # corpus-sized (VERDICT r11 #3: no unbounded corpus-scale pins),
    # and the md5 register hash runs once per distinct token instead
    # of once per occurrence.
    toks = (d.select("lang",
                     F.explode(F.split(_norm_text(), " ")).alias("tok"))
            .where(F.col("tok") != "")).distinct().localCheckpoint()
    h5 = F.md5(F.col("tok"))
    idx = F.conv(F.substring(h5, 31, 2), 16, 10).cast("long") % _HLL_M
    v = F.conv(F.substring(h5, 1, 8), 16, 10).cast("long")
    rho = F.when(v == 0, F.lit(33)).otherwise(
        32 - F.floor(F.log2(v.cast("double"))).cast("long"))
    regs = (toks.select("lang", idx.alias("idx"), rho.alias("rho"))
            .groupBy("lang", "idx").agg(F.max("rho").alias("m")))
    alpha = F.lit(0.7213) / (1 + F.lit(1.079) / _HLL_M)
    sums = regs.groupBy("lang").agg(
        F.sum(F.pow(F.lit(2.0), -F.col("m").cast("double"))).alias("s"),
        F.count(F.lit(1)).alias("n_regs"))
    exact = toks.groupBy("lang").agg(
        F.countDistinct("tok").cast("long").alias("exact_distinct"))
    raw = alpha * _HLL_M * _HLL_M / (F.col("s") + (_HLL_M - F.col("n_regs")))
    est = F.when((raw <= 2.5 * _HLL_M) & (F.col("n_regs") < _HLL_M),
                 _HLL_M * F.log(F.lit(float(_HLL_M))
                                / (_HLL_M - F.col("n_regs")))) \
        .otherwise(raw)
    return (exact.join(sums, "lang")
            .select("lang", "exact_distinct",
                    F.floor(est).cast("long").alias("hll_est"),
                    F.floor(F.abs(est - F.col("exact_distinct"))
                            * 1000000.0 / F.col("exact_distinct"))
                    .cast("long").alias("err_ppm")))


_BLOOM_M = 262144   # bits (2^18) — sized for the benchmark set, not 512
_BLOOM_K = 4        # hash functions

_SHINGLE_SQL = ("CASE WHEN len(w) >= 3 THEN list_distinct("
                "list_transform(range(1, len(w) - 1), "
                "i -> w[i] || ' ' || w[i + 1] || ' ' || w[i + 2])) "
                "ELSE [norm] END")


@query(
    "bloom_shingle_filter",
    f"""
    WITH base AS (
      SELECT doc_id, source, string_split({_NORM_SQL}, ' ') AS w,
             {_NORM_SQL} AS norm
      FROM documents
    ),
    sh AS (
      SELECT doc_id, source, unnest({_SHINGLE_SQL}) AS shingle FROM base
    ),
    bench AS (SELECT DISTINCT shingle FROM sh WHERE source = 'src0'),
    bloombits AS MATERIALIZED (
      SELECT DISTINCT
             {_hex_int_sql("md5(CAST(r.j AS VARCHAR) || '|' || shingle)",
                           28, 5)} % {_BLOOM_M} AS b
      FROM bench, range(0, {_BLOOM_K}) r(j)
    ),
    train AS (
      SELECT DISTINCT doc_id, shingle FROM sh WHERE source <> 'src0'
    ),
    probes AS (
      SELECT t.doc_id, t.shingle,
             {_hex_int_sql("md5(CAST(r.j AS VARCHAR) || '|' || t.shingle)",
                           28, 5)} % {_BLOOM_M} AS b
      FROM train t, range(0, {_BLOOM_K}) r(j)
    ),
    tested AS (
      SELECT p.doc_id, p.shingle,
             CASE WHEN COUNT(bb.b) = {_BLOOM_K} THEN 1 ELSE 0 END
               AS bloom_pass
      FROM probes p LEFT JOIN bloombits bb ON p.b = bb.b
      GROUP BY p.doc_id, p.shingle
    ),
    labeled AS (
      SELECT t.doc_id, t.bloom_pass,
             CASE WHEN b.shingle IS NOT NULL THEN 1 ELSE 0 END AS truth
      FROM tested t LEFT JOIN bench b ON t.shingle = b.shingle
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_shingles,
           CAST(SUM(bloom_pass) AS BIGINT) AS n_bloom_pass,
           CAST(SUM(truth) AS BIGINT) AS n_true,
           CAST(SUM(bloom_pass) - SUM(truth) AS BIGINT)
             AS n_false_positive
    FROM labeled GROUP BY doc_id
    """,
    "textops", "scale", "dedup",
    doc="Bloom-filter membership pre-screen (Bloom 1970) for the "
        f"decontamination join: a {_BLOOM_M}-bit (2^18) / {_BLOOM_K}-"
        "hash filter over the benchmark shingle set, tested against "
        "every training shingle, with the TRUE match set joined "
        "alongside so the false-positive count is measured per "
        "document. Bloom never misses (n_bloom_pass >= n_true always "
        "— a zero false-negative guarantee both engines must "
        "reproduce exactly); md5-derived bit positions make the "
        "filter bit-identical across engines. Scale shape: membership "
        "is a hash JOIN on integer bit ids against the (distinct, "
        "broadcastable) set-bit table — never a per-row linear scan "
        "of a bit array — and the filter is sized ~13 bits/element "
        "for the sf0.1 benchmark set (~0.8% theoretical FP at k=4; "
        "the measured rate is the n_false_positive column). The "
        "oracle-checkable twin of the runtime bloom-filter join "
        "pruning Spark's AQE injects natively: only bloom-passing "
        "shingles would reach the expensive verification join. "
        "Completes the sketch trio: count-min (frequency), HLL "
        "(cardinality), Bloom (membership).",
)
def bloom_shingle_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    from ..operators.dedup import shingles
    from ..operators.pinning import pin_if_bounded

    d = load_table(spark, sf_dir, "documents")
    # pinned: feeds the benchmark side (filter bits + truth join) and
    # the training side — unpinned, the corpus re-shingles per branch.
    # The pin is CORPUS-scale (one row per doc-shingle), so it is
    # size-guarded: above the budget the branches recompute instead of
    # pinning ~1x corpus on executor disk (VERDICT r11 #3)
    sh = pin_if_bounded(
        d.select("doc_id", "source",
                 F.explode(shingles(F.col("text"), 3)).alias("shingle")),
        sf_dir, "documents")
    bench = (sh.where(F.col("source") == "src0")
             .select("shingle").distinct())

    def bit(j, col):
        h = F.md5(F.concat(F.lit(f"{j}|"), col))
        return F.conv(F.substring(h, 28, 5), 16, 10).cast("long") % _BLOOM_M

    bloombits = (bench.select(F.explode(F.array(*[
        bit(j, F.col("shingle")) for j in range(_BLOOM_K)])).alias("b"))
        .distinct())
    train = (sh.where(F.col("source") != "src0")
             .select("doc_id", "shingle").distinct())
    probes = train.select("doc_id", "shingle", F.explode(F.array(*[
        bit(j, F.col("shingle")) for j in range(_BLOOM_K)])).alias("b"))
    tested = (probes
              .join(F.broadcast(bloombits.withColumnRenamed("b", "_hit")),
                    F.col("b") == F.col("_hit"), "left")
              .groupBy("doc_id", "shingle")
              .agg(F.when(F.count("_hit") == _BLOOM_K, 1).otherwise(0)
                   .alias("bloom_pass")))
    labeled = (tested
               .join(bench.withColumnRenamed("shingle", "_b"),
                     F.col("shingle") == F.col("_b"), "left")
               .select("doc_id", "bloom_pass",
                       F.when(F.col("_b").isNotNull(), 1).otherwise(0)
                       .alias("truth")))
    return (labeled.groupBy("doc_id")
            .agg(F.count(F.lit(1)).cast("long").alias("n_shingles"),
                 F.sum("bloom_pass").cast("long").alias("n_bloom_pass"),
                 F.sum("truth").cast("long").alias("n_true"),
                 (F.sum("bloom_pass") - F.sum("truth")).cast("long")
                 .alias("n_false_positive")))
