"""Warm per-query timer: runs each named query N times in one session
(bench-identical noop force + cache release) and prints every rep,
plus min/median. For quick A/B of a code change on a targeted set —
NOT a replacement for bench.py or tools/bench_compare.py.

    python tools/warm_time.py [sf_dir] query [query ...] [--reps=N]
"""

from __future__ import annotations

import statistics
import sys
import time

sys.path.insert(0, ".")


def main() -> None:
    argv = sys.argv[1:]
    args: list[str] = []
    reps = 2
    i = 0
    while i < len(argv):
        a = argv[i]
        if a.startswith("--reps"):
            if "=" in a:
                reps = int(a.split("=", 1)[1])
            else:
                i += 1
                reps = int(argv[i])
        else:
            args.append(a)
        i += 1
    sf_dir = args[0] if args and "/" in args[0] else "/root/testdata/sf0.1"
    names = args[1:] if args and "/" in args[0] else args

    import __spark_entry__ as entrymod
    from bench import calibration_probe, force
    from hha_spark.session import get_spark

    qs = entrymod.queries()
    spark = get_spark("hha_warm_time")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    print(f"calibration {calibration_probe(spark):.3f}s", flush=True)
    for name in names:
        fn = qs[name]
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            force(fn(spark, sf_dir))
            ts.append(time.perf_counter() - t0)
        print(
            f"{name}: min={min(ts):.3f} med={statistics.median(ts):.3f} "
            f"reps={[round(t, 3) for t in ts]}",
            flush=True,
        )
    print(f"calibration {calibration_probe(spark):.3f}s", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
