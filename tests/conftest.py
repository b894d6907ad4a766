from __future__ import annotations

import pytest
from pyspark.sql import SparkSession

from hha_spark.session import get_spark


@pytest.fixture(scope="session")
def spark() -> SparkSession:
    s = get_spark(app_name="hha_spark_tests", shuffle_partitions=4)
    yield s
    s.stop()


def gopher_doc_text(seed: int, mutate: int = 0) -> str:
    """40 distinct tokens — passes every Gopher rule (length band,
    mode-token cap, diversity floor, bigram cap). `mutate` swaps the
    last token so near-dup (not exact-dup) pairs exist too
    (jaccard 39/41 >= 0.7). ONE definition: the curation-stream and
    store-compaction suites both encode the Gopher-passing document
    shape through this helper, so a threshold change cannot silently
    de-fang one of them."""
    toks = [f"w{seed}x{i}" for i in range(40)]
    if mutate:
        toks[-1] = f"m{seed}x{mutate}"
    return " ".join(toks)
