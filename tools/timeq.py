"""Quick per-query timing probe: `python tools/timeq.py q1 q2 ... [--sf DIR] [--reps N]`.

Mirrors bench.py's measurement shape (count() action, min of reps) for
fast local A/B iteration on individual queries without the full suite.
"""
from __future__ import annotations

import argparse
import gc
import sys
import time

sys.path.insert(0, ".")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="+")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument(
        "--warm",
        action="store_true",
        help="bench.py-style warmup: one sf0.001 pass (codegen) + one "
        "untimed target-SF pass (JIT tiering + page cache) per query",
    )
    args = ap.parse_args()

    import __spark_entry__ as entry

    # the BENCH session factory, not an ad-hoc builder: A/B numbers are
    # only comparable to bench.py rows if broadcast threshold, AQE,
    # codec and cleaner settings match (r11 — the old ad-hoc session
    # measured dedup_clusters 9.1 s where the bench session runs 6.4)
    from transcriptomics_data_integration_spark.session import get_spark

    spark = get_spark("timeq")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entry.queries()
    for name in args.names:
        fn = qs[name]
        if args.warm:
            fn(spark, "/root/testdata/sf0.001").count()
            fn(spark, args.sf).count()
            spark.catalog.clearCache()
        times = []
        for _ in range(args.reps):
            gc.collect()
            spark.sparkContext._jvm.System.gc()
            t0 = time.perf_counter()
            n = fn(spark, args.sf).count()
            times.append(time.perf_counter() - t0)
        print(f"{name}: min={min(times):.2f}s all={[round(t, 2) for t in times]} rows={n}")
    spark.stop()


if __name__ == "__main__":
    main()
