"""Same-host bench control: bench HEAD and a reference git ref
back-to-back and emit ONE JSON artifact with both results.

    python tools/bench_compare.py                # vs HEAD~1
    python tools/bench_compare.py --ref <sha>    # vs any ref
    python tools/bench_compare.py --sf-dir /root/testdata/sf0.01

Why: cross-round bench totals on this sandbox confound CODE deltas
with HOST-PHASE deltas (round 9: +11 s raw vs round 8 that a manual
worktree rebuild of the r8 HEAD proved was the host running 15-25%
slower that day — the code was actually 0.90x). This tool automates
that control: the ref is checked out into a throwaway git worktree
(working tree untouched), `bench.py` runs there and at HEAD on the
same host minutes apart, and the artifact carries both totals plus
each run's own calibration probes, so a reviewer can attribute any
delta without re-deriving the experiment.

Order: ref first, then HEAD — if the host drifts mid-experiment the
bias runs AGAINST the new code, so "HEAD faster than ref" survives
the confound. Each bench is a fresh subprocess (own JVM). One bias
runs the OTHER way: the first bench after idle also absorbs
OS/page-cache warm-up (visible as an inflated ref
calibration.start_sec — e.g. 6.2 s vs 1.0 s on the first smoke).
`--warmup` runs one discarded HEAD bench before the pair to drain
that; always compare the two calibration blocks before trusting a
ratio either way.

Output: one JSON line {"sf_dir", "ref", "head", "ratio"} where ref/
head each carry {describe, total_sec, n_queries, n_failed,
calibration_sec} and ratio is the common-subset total ratio
(head/ref over queries timed in BOTH runs — per-query maps come
from each run's .benchmarks/bench_last.json). Also written to
.benchmarks/bench_compare_last.json with the full per-query maps.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _git(*args: str, cwd: str = REPO) -> str:
    return subprocess.run(
        ["git", *args], cwd=cwd, check=True, capture_output=True, text=True
    ).stdout.strip()


def _run_bench(workdir: str, sf_dir: str) -> dict:
    env = dict(os.environ, SPARK_GRAFT_SF_DIR=sf_dir)
    proc = subprocess.run(
        [sys.executable, "bench.py"],
        cwd=workdir,
        env=env,
        capture_output=True,
        text=True,
    )
    if proc.returncode != 0:
        raise RuntimeError(
            f"bench.py failed in {workdir}: {proc.stderr.strip()[-500:]}"
        )
    line = proc.stdout.strip().splitlines()[-1]
    summary = json.loads(line)
    with open(os.path.join(workdir, ".benchmarks/bench_last.json")) as f:
        summary["queries"] = json.load(f)["queries"]
    return summary


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--ref", default="HEAD~1", help="git ref to control")
    ap.add_argument(
        "--sf-dir",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"),
    )
    ap.add_argument(
        "--warmup",
        action="store_true",
        help="run one discarded HEAD bench first (drains OS/page-cache "
        "warm-up so the ref-first run is not cold-biased)",
    )
    args = ap.parse_args()

    ref_sha = _git("rev-parse", args.ref)
    wt = tempfile.mkdtemp(prefix="hha_bench_ref_")
    # worktree add refuses a non-empty dir; use a child path
    wt_dir = os.path.join(wt, "ref")
    _git("worktree", "add", "--detach", wt_dir, ref_sha)
    try:
        if args.warmup:
            _run_bench(REPO, args.sf_dir)
        ref_run = _run_bench(wt_dir, args.sf_dir)
        head_run = _run_bench(REPO, args.sf_dir)
    finally:
        subprocess.run(
            ["git", "worktree", "remove", "--force", wt_dir],
            cwd=REPO,
            capture_output=True,
        )

    common = {
        n
        for n, t in head_run["queries"].items()
        if t is not None and ref_run["queries"].get(n) is not None
    }
    head_c = sum(head_run["queries"][n] for n in common)
    ref_c = sum(ref_run["queries"][n] for n in common)

    def _side(run: dict, describe: str) -> dict:
        return {
            "describe": describe,
            "total_sec": run["value"],
            "n_queries": run.get("n_queries"),
            "n_failed": run.get("n_failed"),
            "calibration_sec": run.get("calibration_sec"),
            "queries": run["queries"],
        }

    full = {
        "sf_dir": args.sf_dir,
        "ref": _side(ref_run, f"{args.ref} ({ref_sha[:12]})"),
        "head": _side(head_run, _git("rev-parse", "--short", "HEAD")),
        "common_subset": {
            "n": len(common),
            "head_sec": round(head_c, 3),
            "ref_sec": round(ref_c, 3),
            "ratio": round(head_c / ref_c, 4) if ref_c else None,
        },
    }
    os.makedirs(os.path.join(REPO, ".benchmarks"), exist_ok=True)
    with open(
        os.path.join(REPO, ".benchmarks/bench_compare_last.json"), "w"
    ) as f:
        json.dump(full, f, separators=(",", ":"))
    compact = {
        **{k: v for k, v in full.items() if k != "ref" and k != "head"},
        "ref": {k: v for k, v in full["ref"].items() if k != "queries"},
        "head": {k: v for k, v in full["head"].items() if k != "queries"},
    }
    print(json.dumps(compact, separators=(",", ":")), flush=True)


if __name__ == "__main__":
    main()
