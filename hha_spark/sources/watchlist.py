"""Watchlist (zones) source.

The reference polls a Consul KV subtree every 300 s in an
unsynchronized thread and mutates a shared Python set
(hha.py:41-71; hazard: `clear()` races the detection loop's
membership checks). Here the watchlist is a small dimension
DataFrame re-read per detection cycle — no shared mutable state, no
thread — and gating is a broadcast semi-join (operators/spike.py).

Parse semantics preserved from hha.py:56-66:
  * input is newline-separated entries (possibly multiple blobs);
  * lines STARTING with '#' are comments (the reference's
    `re.match(r'#', ...)` only anchors at the start);
  * entries that don't parse as IPv4 are logged and skipped;
  * result is a set of IPv4-as-int.
"""

from __future__ import annotations

import ipaddress
import logging

from pyspark.sql import DataFrame, SparkSession

from hha_spark.schemas import ZONES_SCHEMA

logger = logging.getLogger(__name__)


def parse_zone_lines(blobs: list[str]) -> set[int]:
    """Pure parser — identical tolerance to the reference's loop."""
    out: set[int] = set()
    lines: list[str] = []
    for blob in blobs:
        lines += blob.split("\n")
    for line in lines:
        if line.startswith("#"):
            continue
        try:
            out.add(int(ipaddress.IPv4Address(line.strip())))
        except (ipaddress.AddressValueError, ValueError):
            if line.strip():
                logger.warning("in zones wrong format ip %s", line)
    return out


def zones_from_text_file(spark: SparkSession, path: str) -> DataFrame:
    """Watchlist from a text file (one entry per line)."""
    with open(path, encoding="utf-8") as fh:
        ips = parse_zone_lines([fh.read()])
    return zones_from_ints(spark, ips)


def zones_from_ints(spark: SparkSession, ips: set[int] | list[int]) -> DataFrame:
    return spark.createDataFrame([(int(ip),) for ip in sorted(set(ips))], ZONES_SCHEMA)
