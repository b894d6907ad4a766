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
    # Arrow table, not a Python RDD: the watchlist is driver-small by
    # contract and sits on the BROADCAST side of every zones gate —
    # each broadcast build re-evaluates the source, and a Python-RDD
    # frame pays one Python worker task (~0.2 s protocol latency on
    # this sandbox) per such job; the Arrow frame is a pure-JVM scan
    from hha_spark.functions.local import arrow_rows_frame

    return arrow_rows_frame(
        spark, [(int(ip),) for ip in sorted(set(ips))], ZONES_SCHEMA
    )


def parse_consul_kv_payload(payload: bytes | str) -> set[int]:
    """Parse a Consul `GET /v1/kv/<dir>?recurse=true` JSON response.

    Mirrors the reference poller's handling (hha.py:57-66): each
    entry's Value is base64 (python-consul pre-decodes; the raw HTTP
    API does not), entries with null Value (directory keys) are
    skipped, every value is utf-8-decoded, newline-split, and fed
    through the same comment/format-tolerant line parser.
    """
    import base64
    import json

    entries = json.loads(payload)
    blobs = []
    for entry in entries or []:
        value = entry.get("Value")
        if value is None:
            continue
        blobs.append(base64.b64decode(value).decode("utf-8"))
    return parse_zone_lines(blobs)


def zones_from_consul_kv(
    spark: SparkSession,
    *,
    host: str,
    port: int = 8500,
    key_dir: str,
    timeout_sec: float = 5.0,
    fetch=None,
) -> DataFrame:
    """Watchlist from a Consul-compatible HTTP KV store.

    Speaks the plain Consul HTTP API (`/v1/kv/<dir>?recurse=true`)
    via stdlib urllib — no client library dependency — with the same
    recurse + parse semantics as the reference's poller thread
    (hha.py:48-49,57-66). Unlike the reference there is no background
    thread mutating a shared set: call this per detection cycle and
    broadcast the result (sub-ms for watchlist-sized dimensions).

    `fetch(url) -> bytes` is injectable for tests / alternate
    transports.
    """
    if fetch is None:
        from urllib.request import urlopen

        def fetch(url: str) -> bytes:  # pragma: no cover - network
            with urlopen(url, timeout=timeout_sec) as resp:
                return resp.read()

    url = f"http://{host}:{port}/v1/kv/{key_dir.strip('/')}?recurse=true"
    return zones_from_ints(spark, parse_consul_kv_payload(fetch(url)))
