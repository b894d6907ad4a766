"""Watchlist as a first-class Spark data source (Python Data Source
API, Spark 4): `spark.read.format("zones")` and
`spark.readStream.format("zones")`.

The reference couples watchlist ingestion to a background thread
mutating a shared set (hha.py:41-71). The batch path here
(sources/watchlist.py) already replaced that with a per-cycle read;
this module additionally exposes the same parse semantics through
Spark's source registry, so a watchlist is *a table*:

  * batch: one row per entry of the file at read time;
  * streaming: a change stream — each micro-batch emits entries ADDED
    since the last offset (the reference's 300 s poll loop, recast as
    a proper incremental source with a replayable offset instead of a
    thread clearing a shared set mid-cycle).

The offset is the full sorted entry list. That is deliberate:
watchlists are tiny dimensions (the reference's Consul subtree), so a
value-complete offset stays bytes-small, makes every batch replayable
from the checkpoint alone, and lets removal tracking be added later
without an offset-format break. This would be the WRONG design for an
unbounded source — the point of the demo is matching the design to
the data's scale, exactly like broadcast vs shuffle joins.

Python-side row generation is the slow path in general; it is correct
here because the source is small by contract and feeds a broadcast
semi-join, never a fact-table scan.
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

from hha_spark.sources.watchlist import parse_zone_lines

SCHEMA = "ip bigint"


def _read_entries(path: str) -> list[int]:
    try:
        with open(path, encoding="utf-8") as fh:
            return sorted(parse_zone_lines([fh.read()]))
    except FileNotFoundError:
        return []


class ZonesBatchReader(DataSourceReader):
    def __init__(self, options: dict):
        self._path = options["path"]

    def partitions(self):
        # a watchlist is one small file -> one partition by design
        return [InputPartition(0)]

    def read(self, partition):
        for ip in _read_entries(self._path):
            yield (ip,)


class ZonesStreamReader(SimpleDataSourceStreamReader):
    def __init__(self, options: dict):
        self._path = options["path"]

    def initialOffset(self) -> dict:
        return {"entries": []}

    def read(self, start: dict):
        seen = set(start.get("entries", []))
        current = _read_entries(self._path)
        added = [(ip,) for ip in current if ip not in seen]
        # offset = union, so a momentarily-truncated file can't cause
        # re-emission of entries that were already delivered
        end = {"entries": sorted(seen | set(current))}
        return (iter(added), end)

    def readBetweenOffsets(self, start: dict, end: dict):
        seen = set(start.get("entries", []))
        return iter(
            (ip,) for ip in end.get("entries", []) if ip not in seen
        )


class ZonesDataSource(DataSource):
    """Register with `spark.dataSource.register(ZonesDataSource)`."""

    @classmethod
    def name(cls) -> str:
        return "zones"

    def schema(self) -> str:
        return SCHEMA

    def reader(self, schema) -> ZonesBatchReader:
        return ZonesBatchReader(self.options)

    def simpleStreamReader(self, schema) -> ZonesStreamReader:
        return ZonesStreamReader(self.options)
