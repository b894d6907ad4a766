"""IO helpers + INI config parity."""

from __future__ import annotations

import textwrap

import pytest
from pyspark.sql import types as T

from hha_spark.config import DetectorParams
from hha_spark.sources.io import read_csv, read_delta, read_json, write_table

SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType()),
        T.StructField("name", T.StringType()),
        T.StructField("score", T.DoubleType()),
    ]
)


def test_csv_roundtrip_with_schema(spark, tmp_path):
    p = str(tmp_path / "csv")
    (tmp_path / "csv").mkdir()
    (tmp_path / "csv" / "part.csv").write_text("id,name,score\n1,a,1.5\n2,b,2.5\n")
    df = read_csv(spark, p, SCHEMA)
    rows = sorted(map(tuple, df.collect()))
    assert rows == [(1, "a", 1.5), (2, "b", 2.5)]
    assert df.schema["id"].dataType == T.LongType()  # no inference drift


def test_json_and_orc_write_roundtrip(spark, tmp_path):
    src = spark.createDataFrame([(1, "a", 1.5)], SCHEMA)
    jp = str(tmp_path / "j")
    src.write.json(jp)
    assert read_json(spark, jp, SCHEMA).count() == 1
    op = str(tmp_path / "o")
    write_table(src, op, fmt="orc", mode="overwrite")
    assert spark.read.orc(op).count() == 1


def test_delta_stub_raises_cleanly(spark, tmp_path):
    with pytest.raises(NotImplementedError, match="Delta Lake"):
        read_delta(spark, str(tmp_path))


def test_detector_params_from_ini(tmp_path):
    conf = tmp_path / "hha.conf"
    conf.write_text(
        textwrap.dedent(
            """
            [other]
            sleepInterval = 7
            LimitNewData = 111
            LimitNewDataNet = 222
            quotientAmplification = 4
            LimitDetectTimeSec = 55
            """
        )
    )
    p = DetectorParams.from_ini(str(conf))
    assert (p.sleep_interval, p.limit_new_data, p.limit_new_data_net) == (7, 111, 222)
    assert (p.quotient_amplification, p.limit_detect_time_sec) == (4, 55)
    with pytest.raises(FileNotFoundError):
        DetectorParams.from_ini(str(tmp_path / "missing.conf"))


def test_upsert_parquet_merges_by_key(spark, tmp_path):
    from pyspark.sql import types as T

    from hha_spark.sources.io import upsert_parquet

    schema = T.StructType(
        [
            T.StructField("k", T.LongType(), False),
            T.StructField("v", T.StringType(), True),
        ]
    )
    path = str(tmp_path / "tbl")
    base = spark.createDataFrame([(1, "a"), (2, "b"), (3, "c")], schema)
    assert upsert_parquet(spark, base, path, key_cols=["k"], schema=schema) == 3
    # update one key, insert a new one
    delta = spark.createDataFrame([(2, "B"), (4, "d")], schema)
    assert upsert_parquet(spark, delta, path, key_cols=["k"], schema=schema) == 4
    got = {(r.k, r.v) for r in spark.read.schema(schema).parquet(path).collect()}
    assert got == {(1, "a"), (2, "B"), (3, "c"), (4, "d")}


def test_kafka_stub_raises_cleanly(spark):
    import pytest as _pytest

    from hha_spark.sources.io import read_kafka_stream

    with _pytest.raises(NotImplementedError, match="spark-sql-kafka"):
        read_kafka_stream(spark, bootstrap="b:9092", topic="t")
