"""Python Data Source API: the watchlist as a registered source,
batch and incremental-stream."""

from __future__ import annotations

import pytest

from hha_spark.sources.zones_datasource import ZonesDataSource


@pytest.fixture(scope="module")
def registered(spark):
    spark.dataSource.register(ZonesDataSource)
    return spark


def test_batch_read_parses_with_reference_tolerance(registered, tmp_path):
    f = tmp_path / "zones.txt"
    f.write_text("# comment\n10.100.6.12\nnot-an-ip\n10.100.6.13\n")
    df = registered.read.format("zones").option("path", str(f)).load()
    assert df.schema.simpleString() == "struct<ip:bigint>"
    assert sorted(r.ip for r in df.collect()) == [174327308, 174327309]


def test_stream_emits_only_added_entries(registered, tmp_path):
    f = tmp_path / "zones.txt"
    ckpt = str(tmp_path / "ckpt")
    f.write_text("10.100.6.12\n")
    q = (
        registered.readStream.format("zones")
        .option("path", str(f))
        .load()
        .writeStream.format("memory")
        .queryName("zones_stream")
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
        got1 = sorted(r.ip for r in registered.sql("SELECT * FROM zones_stream").collect())
        assert got1 == [174327308]

        # appending one entry emits exactly the new one, once
        f.write_text("10.100.6.12\n10.100.6.13\n")
        q.processAllAvailable()
        got2 = sorted(r.ip for r in registered.sql("SELECT * FROM zones_stream").collect())
        assert got2 == [174327308, 174327309]

        # an unchanged file emits nothing new
        q.processAllAvailable()
        got3 = sorted(r.ip for r in registered.sql("SELECT * FROM zones_stream").collect())
        assert got3 == got2
    finally:
        q.stop()
