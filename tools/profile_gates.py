"""Wall vs in-job census of any registered query (default: the eight
non-funnel streaming gates).

For each query: run once warm, record (a) end-to-end wall, (b) the sum
of Spark job durations submitted during the run and the job count
(UI REST API diff), (c) the number of jobs whose stages touched a
Python runner. The gap wall - in_job is the non-job machinery floor —
driver-side plan construction/analysis, stream offset/commit latency,
py4j chatter — i.e. the round-12 fusion target (guide §1.1/§4.1).

    python tools/profile_gates.py [sf_dir] [query ...] [--reps=N]
"""

from __future__ import annotations

import json
import sys
import time
import urllib.request

sys.path.insert(0, ".")

DEFAULT_GATES = [
    "stream_sessionize_incremental",
    "stream_sessionize_disorder",
    "stream_attribution_disorder",
    "stream_dedup_incremental",
    "stream_cms_heavy",
    "stream_temperature_mixture",
    "stream_spike_alerts",
    "stream_attribution_join",
]


def _api(spark, suffix: str):
    ui = spark.sparkContext.uiWebUrl
    app = spark.sparkContext.applicationId
    with urllib.request.urlopen(f"{ui}/api/v1/applications/{app}/{suffix}") as r:
        return json.load(r)


def _jobs(spark):
    return _api(spark, "jobs?status=succeeded") + _api(spark, "jobs?status=failed")


def _parse_ts(s: str) -> float:
    # "2026-08-18T02:16:47.123GMT"
    return time.mktime(time.strptime(s[:19], "%Y-%m-%dT%H:%M:%S"))


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    reps = 1
    for a in sys.argv[1:]:
        if a.startswith("--reps"):
            reps = int(a.split("=", 1)[1]) if "=" in a else reps
    sf_dir = args[0] if args else "/root/testdata/sf0.1"
    names = args[1:] or DEFAULT_GATES

    import __spark_entry__ as entrymod
    from bench import force
    from hha_spark.session import get_spark

    qs = entrymod.queries()
    spark = get_spark("hha_profile_gates")
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # warm JVM

    for rep in range(reps):
        for name in names:
            fn = qs[name]
            before = {j["jobId"] for j in _jobs(spark)}
            t0 = time.perf_counter()
            force(fn(spark, sf_dir))
            wall = time.perf_counter() - t0
            new = [j for j in _jobs(spark) if j["jobId"] not in before]
            in_job = 0.0
            for j in new:
                if "completionTime" in j and "submissionTime" in j:
                    in_job += _parse_ts(j["completionTime"]) - _parse_ts(
                        j["submissionTime"]
                    )
                    # sub-second parts are truncated by strptime; add
                    # fractional from the raw strings
                    fs = float("0" + j["submissionTime"][19:23].replace(
                        "G", ""
                    ) or 0)
                    fc = float("0" + j["completionTime"][19:23].replace(
                        "G", ""
                    ) or 0)
                    in_job += fc - fs
            print(
                f"rep{rep} {name}: wall={wall:.2f}s in_job={in_job:.2f}s "
                f"jobs={len(new)} gap={wall - in_job:.2f}s",
                flush=True,
            )
    spark.stop()


if __name__ == "__main__":
    main()
