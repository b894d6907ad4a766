"""Operational CLI for versioned-store history compaction.

    python tools/compact.py <store_root> --flavor curation [--major]
    python tools/compact.py <store_root> --kinds closed,attr [--major]
    python tools/compact.py <store_root> --recover-only

The in-stream path is the funnel processor's `compact_every` knob
(streaming/curation_stream.py); this CLI is the maintenance-window
entry point — run a MAJOR fold while the stream is stopped to
collapse accumulated minor bases to a single one, or heal a crashed
fold (`--recover-only`). Single-writer contract applies: do not run
against a store whose stream is live (the processors' own knob is
the only safe in-flight route, because it runs between epochs on the
stream's thread).

Emits one JSON line: {"folded": N, "base": B} (or the recovery
outcome), matching compact_store's return value.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

# repo root from this file's location, not the caller's CWD — a
# maintenance CLI gets invoked as `python /path/to/repo/tools/compact.py
# <remote store>` from arbitrary working directories
sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

FLAVORS = {
    "sessionize": "SESSIONIZE_HISTORY",
    "attribution": "ATTRIBUTION_HISTORY",
    "curation": "CURATION_HISTORY",
}


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("store_root")
    grp = ap.add_mutually_exclusive_group(required=True)
    grp.add_argument(
        "--flavor", choices=sorted(FLAVORS), help="named store shape"
    )
    grp.add_argument(
        "--kinds", help="comma-separated history kinds (custom stores)"
    )
    grp.add_argument(
        "--recover-only",
        action="store_true",
        help="heal a crashed fold and exit (no new fold)",
    )
    ap.add_argument(
        "--major",
        action="store_true",
        help="fold previously merged bases too (full rewrite)",
    )
    args = ap.parse_args()

    from hha_spark.session import get_spark
    from hha_spark.streaming import store as store_mod

    spark = get_spark("compact_store")
    try:
        if args.recover_only:
            out = {"recovered": store_mod.recover_compaction(
                spark, args.store_root
            )}
        else:
            kinds = (
                getattr(store_mod, FLAVORS[args.flavor])
                if args.flavor
                else tuple(k for k in args.kinds.split(",") if k)
            )
            out = store_mod.compact_store(
                spark,
                args.store_root,
                history_kinds=kinds,
                mode="major" if args.major else "minor",
            )
        print(json.dumps(out))
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
