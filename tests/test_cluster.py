"""Connected-components operator (operators/cluster.py)."""

from __future__ import annotations

import pytest

from hha_spark.operators.cluster import cluster_members, connected_components


def _labels(df) -> dict[int, int]:
    return {r.node: r.label for r in df.collect()}


def test_transitive_chain_and_separate_pair(spark):
    """A~B, B~C, C~D is ONE cluster even though A and D never pair."""
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11)], "doc_id_a long, doc_id_b long"
    )
    assert _labels(connected_components(edges)) == {
        1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10,
    }


def test_cycle_and_reversed_edges(spark):
    """Cycles and arbitrary edge orientation don't matter."""
    edges = spark.createDataFrame(
        [(7, 5), (5, 6), (6, 7), (9, 8)], "doc_id_a long, doc_id_b long"
    )
    assert _labels(connected_components(edges)) == {
        5: 5, 6: 5, 7: 5, 8: 8, 9: 8,
    }


def test_long_chain_converges_logarithmically(spark):
    """Path compression: a 64-node chain must close in far fewer than
    64 rounds (~log2 diameter + slack), not diameter rounds."""
    n = 64
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n)], "doc_id_a long, doc_id_b long"
    )
    out = _labels(connected_components(edges, max_rounds=14))
    assert set(out.values()) == {0}
    assert len(out) == n + 1


def test_non_convergence_raises(spark):
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(32)], "doc_id_a long, doc_id_b long"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(edges, max_rounds=1)


def test_cluster_members_sizes(spark):
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "doc_id_a long, doc_id_b long"
    )
    rows = {
        r.doc_id: (r.cluster_id, r.cluster_size)
        for r in cluster_members(edges).collect()
    }
    assert rows == {1: (1, 3), 2: (1, 3), 3: (1, 3), 10: (10, 2), 11: (10, 2)}
