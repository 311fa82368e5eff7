"""Run every queries() entry on a VANILLA SparkSession (no tuned
configs — the driver's environment) and report failures. Counts only;
value correctness is tools/check.py's job. Catches config-sensitive
breakage: default 200 shuffle partitions, different join strategy
choices, AQE defaults.

Usage: python tools/vanilla_sweep.py [--json OUT.json] [sf_dir]

With ``--json`` the per-query results are written as a committable
artifact (SWEEP_r{N}.json) proving every registered query executes on
a vanilla session against the CURRENT testdata — the guard against
environment drift (regenerated parquet, changed physical types).
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> int:
    from pyspark.sql import SparkSession

    argv = sys.argv[1:]
    json_out = None
    if argv and argv[0] == "--json":
        json_out = argv[1]
        argv = argv[2:]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    spark = (SparkSession.builder.master("local[8]")
             .config("spark.sql.session.timeZone", "UTC")
             .config("spark.ui.enabled", "false").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as e
    results: dict[str, dict] = {}
    n_fail = 0
    for name, fn in e.queries().items():
        t0 = time.time()
        try:
            n = fn(spark, sf_dir).count()
            print(f"OK    {name} ({n} rows, {time.time() - t0:.1f}s)")
            results[name] = {"ok": True, "rows": n,
                             "secs": round(time.time() - t0, 2)}
        except Exception as ex:
            n_fail += 1
            print(f"FAIL  {name}: {type(ex).__name__}: {str(ex)[:200]}")
            results[name] = {"ok": False,
                             "err": f"{type(ex).__name__}: {str(ex)[:200]}"}
    print(f"\n{'ALL OK' if n_fail == 0 else f'{n_fail} FAILURES'}")
    if json_out:
        with open(json_out, "w") as f:
            json.dump({"sf_dir": sf_dir, "total": len(results),
                       "failed": n_fail, "queries": results},
                      f, indent=1, sort_keys=True)
        print(f"wrote {json_out}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
