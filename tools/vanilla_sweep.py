"""Run every queries() entry on a VANILLA SparkSession (no tuned
configs — the driver's environment) and report failures. Counts only;
value correctness is tools/check.py's job. Catches config-sensitive
breakage: default 200 shuffle partitions, different join strategy
choices, AQE defaults.

Usage: python tools/vanilla_sweep.py [sf_dir]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")


def main() -> int:
    from pyspark.sql import SparkSession

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = (SparkSession.builder.master("local[8]")
             .config("spark.sql.session.timeZone", "UTC")
             .config("spark.ui.enabled", "false").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as e
    n_fail = 0
    for name, fn in e.queries().items():
        t0 = time.time()
        try:
            n = fn(spark, sf_dir).count()
            print(f"OK    {name} ({n} rows, {time.time() - t0:.1f}s)")
        except Exception as ex:
            n_fail += 1
            print(f"FAIL  {name}: {type(ex).__name__}: {str(ex)[:200]}")
    print(f"\n{'ALL OK' if n_fail == 0 else f'{n_fail} FAILURES'}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
