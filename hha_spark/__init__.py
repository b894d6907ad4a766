"""hha_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of vacilyok/hadoop-histogram-analyze.

The reference (/root/reference/hha.py) is a DDoS/amplification spike
detector: per-hour Parquet histogram files -> two-window average
comparison -> ratio-threshold alerts, gated by a watchlist and a TTL
dedup. This package re-expresses those semantics Spark-first
(DataFrame/SQL/Catalyst/Structured Streaming) and extends them with
the large-scale training-data-pipeline operators (dedup, similarity
search, text analysis, multimodal plumbing).

Layout:
    config.py      -- DetectorParams (mirrors hha.conf thresholds)
    session.py     -- SparkSession builder tuned for local[N] and cluster
    schemas.py     -- explicit StructTypes for every source
    functions/     -- scalar/vector expression helpers (ip math, text, vectors)
    operators/     -- spike detection, dedup, similarity, text analysis
    sources/       -- histogram parquet reader, watchlist parser
    sinks/         -- alerts writer
    streaming/     -- Structured Streaming variant of the detector
"""

from hha_spark.config import DetectorParams

__all__ = ["DetectorParams"]
__version__ = "0.1.0"
