"""Model-based property tests for the round-4 continuation operators:
triangle counting and gap-fill/LOCF must agree with INDEPENDENT pure-
Python models (written from the documented semantics, not the Spark
code) on randomized inputs — same scheme as test_transform_property.
"""

from __future__ import annotations

import pytest
import datetime as dt
import itertools
from collections import Counter

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


# -- independent models ------------------------------------------------------


def tri_model(baskets: list[list[int]]) -> dict[int, int]:
    """Per-node triangle counts over the support-2 co-occurrence
    graph of the given baskets."""
    w: Counter = Counter()
    for b in baskets:
        for x, y in itertools.combinations(sorted(b), 2):
            if x < y:
                w[(x, y)] += 1
    edges = {p for p, c in w.items() if c >= 2}
    nodes = sorted({n for e in edges for n in e})
    out: Counter = Counter()
    for a, b, c in itertools.combinations(nodes, 3):
        if (a, b) in edges and (b, c) in edges and (a, c) in edges:
            out[a] += 1
            out[b] += 1
            out[c] += 1
    return dict(out)


def gapfill_model(events: list[tuple[int, int, int | None]]
                  ) -> dict[tuple[int, str], tuple[int, int]]:
    """(user, day) -> (n_events, filled_cents) under per-user spines
    + LOCF. ``events`` rows are (user, day_offset, cents_or_None)."""
    base = dt.date(2024, 3, 1)
    daily: dict = {}
    for u, d, cents in events:
        k = (u, d)
        n, s, any_v = daily.get(k, (0, 0, False))
        if cents is None:
            daily[k] = (n + 1, s, any_v)
        else:
            daily[k] = (n + 1, s + cents, True)
    out = {}
    for u in {u for u, _, _ in events}:
        days = [d for (uu, d) in daily if uu == u]
        last = 0
        for d in range(min(days), max(days) + 1):
            n, s, any_v = daily.get((u, d), (0, 0, False))
            if any_v:
                last = s
            out[(u, (base + dt.timedelta(days=d)).isoformat())] = (n, last)
    return out


# -- properties --------------------------------------------------------------


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.lists(st.lists(st.integers(1, 8), min_size=2, max_size=5),
                min_size=1, max_size=12))
@pytest.mark.slow
def test_triangle_matches_model(spark, tmp_path_factory, baskets):
    from pyspark.sql import functions as F

    from adsmasterpipeline_spark.queries.graph import triangle_copurchase

    rows = [(ok, pk) for ok, b in enumerate(baskets) for pk in b]
    df = spark.createDataFrame(rows, "l_orderkey long, l_partkey long")
    sf = str(tmp_path_factory.mktemp("tri"))
    df.coalesce(1).write.mode("overwrite").parquet(sf + "/lineitem.parquet")
    got = {r["part_key"]: r["tri_count"]
           for r in triangle_copurchase(spark, sf).collect()}
    assert got == tri_model(baskets)


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(st.lists(
    st.tuples(st.integers(1, 3), st.integers(0, 12),
              st.one_of(st.none(), st.integers(-500, 500))),
    min_size=1, max_size=25))
@pytest.mark.slow
def test_gapfill_matches_model(spark, tmp_path_factory, events):
    from adsmasterpipeline_spark.queries.temporal import gapfill_forward_fill

    base = dt.datetime(2024, 3, 1, 9)
    rows = [(i, base + dt.timedelta(days=d), u, "view",
             None if cents is None else cents / 100.0, "{}")
            for i, (u, d, cents) in enumerate(events)]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double, props string")
    sf = str(tmp_path_factory.mktemp("gf"))
    df.coalesce(1).write.mode("overwrite").parquet(sf + "/events.parquet")
    got = {(r["user_id"], r["day"].isoformat()):
           (r["n_events"], r["filled_cents"])
           for r in gapfill_forward_fill(spark, sf).collect()}
    assert got == gapfill_model(events)


def test_quantiles_approx_tracks_exact(spark):
    """The documented scale path (percentile_approx with accuracy
    10k) must track the exact grouped quantiles within sketch rank
    error: at accuracy a, eps ~ 1/a, so value-rank displacement on n
    rows is <= n/a + 1 positions. Asserted by rank, not value."""
    from pyspark.sql import functions as F

    from adsmasterpipeline_spark.sources import load_table
    from tests.conftest import SF_DIR

    c = load_table(spark, SF_DIR, "customer")
    probs = [0.25, 0.5, 0.75, 0.95]
    rows = (c.groupBy("c_mktsegment")
            .agg(F.percentile(F.col("c_acctbal"),
                              F.array(*[F.lit(p) for p in probs]))
                 .alias("exact"),
                 F.percentile_approx(F.col("c_acctbal"),
                                     F.array(*[F.lit(p) for p in probs]),
                                     10_000).alias("approx"),
                 F.sort_array(F.collect_list("c_acctbal")).alias("all"))
            .collect())
    for r in rows:
        vals = r["all"]
        n = len(vals)
        tol = n / 10_000 + 1
        import bisect
        for p, ex, ap in zip(probs, r["exact"], r["approx"]):
            rank_ex = bisect.bisect_left(vals, ex)
            rank_ap = bisect.bisect_left(vals, ap)
            assert abs(rank_ex - rank_ap) <= tol, (p, ex, ap)


def test_order_proxy_monotone_property():
    """Hypothesis: for ANY two strings (including non-ASCII, where
    code points clamp to 127), a < b implies proxy(a) <= proxy(b) —
    the invariant that makes range-bucketing on the proxy safe: equal
    proxies share a bucket, so the true ordering is never split."""
    from hypothesis import given, settings
    from hypothesis import strategies as st
    from pyspark.sql import functions as F

    from adsmasterpipeline_spark.operators.assignment import _order_proxy
    from adsmasterpipeline_spark.session import get_spark

    spark = get_spark("proxy_prop", shuffle_partitions=4)

    @settings(max_examples=20, deadline=None)
    @given(st.lists(st.text(min_size=0, max_size=12), min_size=2,
                    max_size=8, unique=True))
    def check(keys):
        df = spark.createDataFrame([(k,) for k in keys], "key string")
        rows = (df.select("key",
                          _order_proxy(F.col("key")).alias("p"))
                .collect())
        got = sorted(((r["key"], r["p"]) for r in rows))
        proxies = [p for _, p in got]
        assert proxies == sorted(proxies), got

    check()
