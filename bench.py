"""Benchmark harness: runs every registered query at the bench scale
factor and prints ONE JSON line with per-query and total wall times.

    SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1)
    SPARK_GRAFT_CPUS   (default: all cores)

Execution is forced with the `noop` sink so timings measure scan +
compute + shuffle without driver-side result materialization.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from hha_spark.session import get_spark  # noqa: E402


def calibration_probe(spark) -> float:
    """Fixed synthetic shuffle+agg over spark.range, timed — a host-speed
    index recorded at sweep start AND end. Two rounds running, cross-round
    bench deltas were dominated by host throughput phases on byte-identical
    code (r4: 161-190 s same-commit; r5: 1.26x common-subset inflation,
    git-verified unchanged); this probe makes the machine's speed during
    THIS sweep part of the artifact, so round-over-round deltas are
    attributable to code vs host. The workload is data-independent
    (spark.range), deterministic, and exercises the same machinery as the
    query sweep: codegen, a hash-partition exchange, and a two-phase
    aggregate."""
    t0 = time.perf_counter()
    (
        spark.range(20_000_000)
        .selectExpr("id % 4096 AS k", "id AS v")
        .groupBy("k")
        .agg({"v": "sum", "*": "count"})
        .write.format("noop")
        .mode("overwrite")
        .save()
    )
    return round(time.perf_counter() - t0, 3)


def force(df) -> None:
    df.write.format("noop").mode("overwrite").save()
    # queries register their internal persists with the session-scoped
    # cache registry (hha_spark/caching.py); release them per query to
    # keep runs independent. clearCache stays as a backstop for any
    # cache created outside the registry (e.g. by Spark itself).
    from hha_spark.caching import release_tracked

    release_tracked()
    df.sparkSession.catalog.clearCache()


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    spark = get_spark("hha_spark_bench")
    # warm the JVM + parquet footer caches outside the timed region
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    # ...and the Arrow python-worker pool, so the first pandas_udf
    # query isn't charged the one-time worker startup
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def _warm(s: pd.Series) -> pd.Series:
        return s

    spark.range(1_000).select(_warm("id")).write.format("noop").mode(
        "overwrite"
    ).save()
    # Bench order is ALPHABETICAL, decoupled from registry order: the
    # registry front-loads the driver's correctness window and is
    # re-rotated every round, which used to shuffle every query's
    # bench position — and position sits on the session's codegen
    # warmup curve, so rotation manufactured phantom per-query deltas
    # (rounds 6-8 each re-attributed one: part_size_classes
    # 0.25 -> 1.32 -> 0.19 s purely from moving positions 37 -> 13 ->
    # out). Alphabetical order is rotation-invariant, so cross-round
    # per-query comparisons now compare like positions.
    ordered = dict(sorted(qs.items()))
    # ...and run the first benched query once UNTIMED: whichever
    # query sits at position 1 otherwise absorbs the remaining
    # first-job costs (parquet footer reads, codegen, shuffle service
    # spin-up) — measured +1.9 s on the same query moved from
    # position 6 to 1 across rounds 3-4
    try:
        first_fn = next(iter(ordered.values()))
        force(first_fn(spark, sf_dir))
    except Exception:  # noqa: BLE001 — warmup must never kill the run
        pass

    cal_start = calibration_probe(spark)

    # Timing-methodology version, stamped into both JSON outputs so
    # cross-round raw-total comparisons are flagged as confounded when
    # the estimator changed. History: v1 = single run; v2 (r9) =
    # median-of-3 under 1 s + min-of-2 over the 8 slowest; v3 (r10) =
    # adds the [1x,2x)-threshold min-of-2 rerun and widens the slow
    # tail to 12 — v3 systematically records LOWER timings than v2 for
    # the same code, so any cross-round ratio claim must come from
    # tools/bench_compare.py (same-host, same-method, ref-first), not
    # from raw BENCH_r{N} totals.
    BENCH_METHOD = "v3"

    # Median-of-3 for sub-second queries: host noise on this sandbox
    # episodically inflates a single sub-second run by several seconds
    # (same query, same plan, 0.4 s vs 4.9 s in adjacent runs), and at
    # 161 queries those spikes dominate cross-round deltas. A query
    # whose first run lands under the threshold is cheap enough to run
    # twice more; the median of 3 is robust to one spiked run in either
    # direction. Queries over the threshold keep single-run timing
    # (their relative noise is small) plus the min-of-2 tail rerun.
    MEDIAN3_UNDER_SEC = 1.0
    timings: dict[str, float | None] = {}
    total = 0.0
    for name, fn in ordered.items():
        t0 = time.perf_counter()
        try:
            force(fn(spark, sf_dir))
            dt = time.perf_counter() - t0
        except Exception as e:  # noqa: BLE001
            # one short line — multi-KB tracebacks once pushed the
            # summary JSON out of the driver's captured tail
            msg = " ".join(str(e).split())[:160]
            print(f"bench: {name} failed: {msg}", file=sys.stderr)
            # null, not NaN — NaN is not valid JSON
            timings[name] = None
            continue
        if dt < MEDIAN3_UNDER_SEC:
            runs = [dt]
            try:
                for _ in range(2):
                    t0 = time.perf_counter()
                    force(fn(spark, sf_dir))
                    runs.append(time.perf_counter() - t0)
            except Exception:  # noqa: BLE001 — keep what we measured
                pass
            # median of 3; if a rerun died, min of what completed
            dt = sorted(runs)[1] if len(runs) == 3 else min(runs)
        elif dt < 2 * MEDIAN3_UNDER_SEC:
            # threshold-cliff guard (the round-9 adjudication ghost:
            # customer_name_features' warm cost is ~0.16 s but its
            # cold first run landed at 1.1 s — just OVER the
            # median-3 trigger — so a 17x "regression" was recorded
            # from a measurement artifact, not a plan change). A
            # first run under 2x the threshold is cheap enough for
            # ONE rerun; keep the min (same noise-robust estimator
            # as the slow-tail rerun below).
            try:
                t0 = time.perf_counter()
                force(fn(spark, sf_dir))
                dt = min(dt, time.perf_counter() - t0)
            except Exception:  # noqa: BLE001 — keep what we measured
                pass
        timings[name] = round(dt, 3)

    # Host timing noise on this sandbox can inflate a single run of a
    # sub-second query by several seconds (documented across rounds:
    # same query, same plan, 0.4 s vs 4.9 s in adjacent runs). For
    # the slowest tail, re-measure once and keep the MINIMUM of the
    # two runs — min-of-N is the standard noise-robust estimator for
    # cold-cache-free repeatable work (the per-query clearCache in
    # force() makes run 2 do the same work as run 1).
    # 12, up from 8 (round 10): the 3-4 s cold-compile class sits just
    # past the old cutoff (e.g. ann_hard_negatives: 0.94 s warm, 4.5 s
    # recorded when a cold first run is the only sample) — four more
    # slots cost ~12 s of bench wall and remove the largest remaining
    # single-sample noise from the recorded totals
    rerun = sorted(
        ((n, t) for n, t in timings.items() if t is not None),
        key=lambda kv: -kv[1],
    )[:12]
    for name, t1 in rerun:
        t0 = time.perf_counter()
        try:
            force(qs[name](spark, sf_dir))
        except Exception:  # noqa: BLE001 — keep the first measurement
            continue
        timings[name] = round(min(t1, time.perf_counter() - t0), 3)
    total = sum(t for t in timings.values() if t is not None)

    cal_end = calibration_probe(spark)
    calibration = {"start_sec": cal_start, "end_sec": cal_end}

    # Full per-query map goes to a local artifact file — a 121-entry
    # map on stdout overflowed the driver's tail capture two rounds
    # running (BENCH parsed: null). The driver-parsed line below stays
    # compact and is emitted LAST, before spark.stop() (stop() can log
    # noise or hang).
    full = {
        "metric": "total_query_wall_time",
        "value": round(total, 3),
        "unit": "sec",
        "method": BENCH_METHOD,
        "queries": timings,
        "sf": sf,
        "calibration_sec": calibration,
    }
    os.makedirs(".benchmarks", exist_ok=True)
    with open(".benchmarks/bench_last.json", "w") as f:
        json.dump(full, f, separators=(",", ":"))
    n_failed = sum(1 for v in timings.values() if v is None)
    slowest = sorted(
        ((n, t) for n, t in timings.items() if t is not None),
        key=lambda kv: -kv[1],
    )[:8]
    print(
        json.dumps(
            {
                "metric": "total_query_wall_time",
                "value": round(total, 3),
                "unit": "sec",
                "method": BENCH_METHOD,
                "sf": sf,
                "n_queries": len(timings),
                "n_failed": n_failed,
                "calibration_sec": calibration,
                "queries": {n: t for n, t in slowest},
                "queries_truncated_to_slowest": len(slowest),
                "queries_file": ".benchmarks/bench_last.json",
            },
            separators=(",", ":"),
        ),
        flush=True,
    )
    spark.stop()


if __name__ == "__main__":
    main()
