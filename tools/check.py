"""Local replica of the driver's correctness gate: run every
``queries()`` entry at a given SF and compare against its
``oracle_sql()`` via DuckDB — row count, sorted-by-name schema, and an
order-insensitive value comparison.

Usage: python tools/check.py [--json OUT.json] [sf_dir] [query_name ...]

With ``--json`` the per-query results are also written as a JSON object
{name: {status, rows, secs, oracled, detail}} so a round can commit the
full-registry evidence (CHECKALL_r{N}.json) instead of relying on
uncommitted local runs.
"""

from __future__ import annotations

import json
import math
import sys
import time
import traceback

sys.path.insert(0, "/root/repo")


def normalize_cell(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 9)
    if isinstance(v, (list, tuple)):
        return tuple(normalize_cell(x) for x in v)
    if hasattr(v, "isoformat"):
        return v.isoformat()
    return v


def normalize_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(normalize_cell(r[i]) for i in order) for r in rows]
    return [cols[i] for i in order], sorted(out, key=repr)


def main() -> int:
    import duckdb

    from adsmasterpipeline_spark.queries import REGISTRY, _load
    from adsmasterpipeline_spark.session import get_spark

    argv = sys.argv[1:]
    json_out = None
    oracle_timeout = None
    if argv and argv[0] == "--json":
        json_out = argv[1]
        argv = argv[2:]
    if argv and argv[0] == "--spark-timeout":
        # watchdog on the SPARK side: cancels all running jobs after
        # the cap so one wedged/thrashing query can't stall the whole
        # registry sweep; recorded as spark_timeout (a real failure —
        # unlike oracle_timeout, OUR side must always finish)
        spark_timeout = float(argv[1])
        argv = argv[2:]
    else:
        spark_timeout = None
    if argv and argv[0] == "--oracle-timeout":
        # wall cap on the DUCKDB side only (the single-node oracle's
        # deliberately-naive all-pairs/recursive formulations go
        # quadratic at stress SFs while the Spark side stays fast);
        # a capped query records ORACLE_TIMEOUT with the spark
        # rows/secs — engine evidence without an unbounded wait
        oracle_timeout = float(argv[1])
        argv = argv[2:]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])

    results: dict[str, dict] = {}

    def record(name, status, rows=None, secs=None, oracled=True, detail=None):
        results[name] = {"status": status, "rows": rows,
                         "secs": None if secs is None else round(secs, 2),
                         "oracled": oracled, "detail": detail}

    _load()
    spark = get_spark("correctness_check")
    con = duckdb.connect()
    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    # three buckets (ADVICE r5): verified-identical vs uncompared-but-
    # Spark-finished vs failed — an oracle timeout is NOT a pass, it is
    # explicitly "engine ran, comparison evidence absent at this SF"
    n_pass = n_fail = n_uncompared = 0
    for name, qd in sorted(REGISTRY.items()):
        if only and name not in only:
            continue
        t0 = time.time()
        watchdog = None
        try:
            if spark_timeout:
                import threading
                watchdog = threading.Timer(
                    spark_timeout, spark.sparkContext.cancelAllJobs)
                watchdog.start()
            sdf = qd.spark_fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception:
            timed_out = (spark_timeout
                         and time.time() - t0 >= spark_timeout)
            status = "spark_timeout" if timed_out else "spark_error"
            print(f"FAIL  {name}: {status}")
            traceback.print_exc(limit=3)
            record(name, status,
                   detail=traceback.format_exc(limit=1).splitlines()[-1])
            n_fail += 1
            continue
        finally:
            if watchdog:
                watchdog.cancel()
            # keep the long sweep memory-flat: operators cache /
            # localCheckpoint internally; dropping the blocks (and
            # nudging the JVM GC so the ContextCleaner releases
            # unreferenced checkpoint RDDs) prevents the session from
            # thrashing 100+ queries in
            spark.catalog.clearCache()
            try:
                spark._jvm.System.gc()
            except Exception:
                pass
        # The driver's value-hash dies on array/map-typed output columns
        # (TypeError: unhashable type) — flag them here before it does.
        from pyspark.sql import types as _T
        complex_cols = [f.name for f in sdf.schema.fields
                        if isinstance(f.dataType, (_T.ArrayType, _T.MapType,
                                                   _T.StructType))]
        if complex_cols and qd.oracle is not None:
            print(f"FAIL  {name}: complex-typed output columns {complex_cols} "
                  f"would crash the driver hasher — serialize to string")
            record(name, "complex_cols", rows=len(srows),
                   detail=str(complex_cols))
            n_fail += 1
            continue
        if qd.oracle is None:
            print(f"OK*   {name}: rows-only ({len(srows)} rows, "
                  f"{time.time()-t0:.1f}s)")
            record(name, "rows_only_ok", rows=len(srows),
                   secs=time.time() - t0, oracled=False)
            n_pass += 1
            continue
        try:
            timer = None
            if oracle_timeout:
                import threading
                spark_secs = time.time() - t0
                timer = threading.Timer(oracle_timeout, con.interrupt)
                timer.start()
            try:
                res = con.execute(qd.oracle)
                ocols = [d[0] for d in res.description]
                orows = res.fetchall()
            finally:
                if timer:
                    timer.cancel()
        except duckdb.InterruptException:
            print(f"OK~   {name}: spark ran ({len(srows)} rows, "
                  f"{spark_secs:.1f}s); oracle exceeded "
                  f"{oracle_timeout:.0f}s wall cap")
            record(name, "oracle_timeout", rows=len(srows),
                   secs=spark_secs,
                   detail=f"duckdb oracle > {oracle_timeout:.0f}s")
            n_uncompared += 1
            continue
        except Exception:
            print(f"FAIL  {name}: duckdb error")
            traceback.print_exc(limit=3)
            record(name, "duckdb_error", rows=len(srows),
                   detail=traceback.format_exc(limit=1).splitlines()[-1])
            n_fail += 1
            continue
        sc, sr = normalize_rows(scols, srows)
        oc, orr = normalize_rows(ocols, orows)
        if sc != oc:
            print(f"FAIL  {name}: schema {sc} != {oc}")
            record(name, "schema_mismatch", rows=len(sr),
                   detail=f"{sc} != {oc}")
            n_fail += 1
            continue
        if len(sr) != len(orr):
            print(f"FAIL  {name}: rows {len(sr)} != {len(orr)}")
            record(name, "rowcount_mismatch",
                   detail=f"spark={len(sr)} oracle={len(orr)}")
            n_fail += 1
            continue
        bad = [(a, b) for a, b in zip(sr, orr) if a != b]
        if bad:
            print(f"FAIL  {name}: {len(bad)} mismatched rows; first: "
                  f"\n  spark={bad[0][0]}\n  duck ={bad[0][1]}")
            record(name, "value_mismatch", rows=len(sr),
                   detail=f"{len(bad)} mismatched rows")
            n_fail += 1
            continue
        print(f"PASS  {name} ({len(sr)} rows, {time.time()-t0:.1f}s)")
        record(name, "pass", rows=len(sr), secs=time.time() - t0)
        n_pass += 1

    print(f"\n{n_pass} passed, {n_uncompared} uncompared (oracle "
          f"timeout), {n_fail} failed")
    if json_out:
        summary = {"sf_dir": sf_dir, "passed": n_pass, "failed": n_fail,
                   "uncompared": n_uncompared, "queries": results}
        with open(json_out, "w") as f:
            json.dump(summary, f, indent=1, sort_keys=True)
        print(f"wrote {json_out}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
