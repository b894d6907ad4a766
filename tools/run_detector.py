"""Runnable detector service — the operational equivalent of the
reference's `python hha.py`.

Batch mode runs one detection cycle per `--interval` seconds (the
reference's sleep loop, hha.py:315-327) against the partitioned
histogram root; streaming mode hands scheduling to Structured
Streaming. Thresholds come from an hha.conf-style INI (--conf) or
defaults; the watchlist is re-read from --zones-file each cycle
(comment lines and malformed IPs tolerated, like the Consul parser).

    python tools/run_detector.py --data-root /data/hist \\
        --alerts /data/alerts --zones-file zones.txt --once
    python tools/run_detector.py --mode streaming --data-root /data/hist \\
        --samples /data/state --alerts /data/alerts --checkpoint /data/ck
"""

from __future__ import annotations

import argparse
import logging
import sys
import time

sys.path.insert(0, ".")

from hha_spark.config import DetectorParams  # noqa: E402
from hha_spark.detector import run_cycle  # noqa: E402
from hha_spark.session import get_spark  # noqa: E402
from hha_spark.sources.watchlist import zones_from_text_file  # noqa: E402
from hha_spark.streaming.spike_stream import run_streaming_detector  # noqa: E402


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--mode", choices=["batch", "streaming"], default="batch")
    ap.add_argument("--data-root", required=True)
    ap.add_argument("--alerts", required=True)
    ap.add_argument("--samples", help="streaming state table root")
    ap.add_argument("--checkpoint", help="streaming checkpoint dir")
    ap.add_argument("--zones-file")
    ap.add_argument("--conf", help="hha.conf-style INI for thresholds")
    ap.add_argument("--interval", type=int, default=None,
                    help="seconds between cycles (default: conf sleepInterval)")
    ap.add_argument("--once", action="store_true", help="run one batch cycle and exit")
    ap.add_argument("--now", type=int, default=None,
                    help="fixed unix-seconds 'now' (testing); default wall clock")
    args = ap.parse_args(argv)

    logging.basicConfig(level=logging.INFO, format="%(asctime)s %(message)s")
    params = DetectorParams.from_ini(args.conf) if args.conf else DetectorParams()
    spark = get_spark("hha_detector")
    zones = (
        zones_from_text_file(spark, args.zones_file) if args.zones_file else None
    )

    if args.mode == "streaming":
        if not (args.samples and args.checkpoint):
            ap.error("--samples and --checkpoint are required in streaming mode")
        query = run_streaming_detector(
            spark,
            data_root=args.data_root,
            samples_root=args.samples,
            alerts_path=args.alerts,
            checkpoint=args.checkpoint,
            params=params,
            zones=zones,
            trigger_sec=args.interval or params.sleep_interval,
            on_rules=lambda rules: [
                logging.info("Generate Rule -> %s", r) for r in rules
            ],
        )
        query.awaitTermination()
        return 0

    interval = args.interval or params.sleep_interval
    while True:
        t0 = time.time()
        rules = run_cycle(
            spark,
            data_root=args.data_root,
            alerts_path=args.alerts,
            params=params,
            zones=zones,
            now=args.now,
        )
        for r in rules:
            # observable output parity with hha.py:240-241
            logging.info(
                "Generate Rule for type protocol %s number protocol %s ip = %s",
                r["type_proto"], r["num_protocol"], r["dst_ip"],
            )
        logging.info("cycle done in %.1fs, %d rules", time.time() - t0, len(rules))
        if args.once:
            return 0
        time.sleep(max(0.0, interval - (time.time() - t0)))


if __name__ == "__main__":
    sys.exit(main())
