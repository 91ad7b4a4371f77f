"""Connected components (min-label propagation) — dedup clustering."""

from mpower_feature_analysis_spark.functions.graph import (
    connected_components,
    near_dup_clusters,
)


def _cc(spark, edges):
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    return {r.id: r.component for r in connected_components(df).collect()}


def test_chain_collapses_to_min(spark):
    # 1-2-3-4-5 chain + isolated pair 10-11
    got = _cc(spark, [(1, 2), (2, 3), (3, 4), (4, 5), (10, 11)])
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1, 10: 10, 11: 10}


def test_star_and_cycle(spark):
    got = _cc(spark, [(7, 3), (7, 9), (7, 5), (20, 21), (21, 22), (22, 20)])
    assert got == {7: 3, 3: 3, 9: 3, 5: 3, 20: 20, 21: 20, 22: 20}


def test_long_chain_converges(spark):
    # diameter 40 — min-label still converges fast because labels jump to
    # the running minimum, not one hop per round
    edges = [(i, i + 1) for i in range(40)]
    got = _cc(spark, edges)
    assert set(got.values()) == {0}


def test_deterministic(spark):
    edges = [(5, 9), (9, 2), (14, 3), (3, 5)]
    a = _cc(spark, edges)
    b = _cc(spark, edges)
    assert a == b == {5: 2, 9: 2, 2: 2, 14: 2, 3: 2}


def test_near_dup_clusters_assigns_everyone(spark):
    docs = spark.createDataFrame([(i,) for i in range(6)], "doc_id long")
    pairs = spark.createDataFrame([(0, 3), (3, 5)], "id_a long, id_b long")
    out = {r.doc_id: (r.canonical_id, r.is_canonical)
           for r in near_dup_clusters(docs, pairs).collect()}
    assert out == {
        0: (0, True), 3: (0, False), 5: (0, False),
        1: (1, True), 2: (2, True), 4: (4, True),
    }
    # keeping canonicals dedups: 4 survivors
    assert sum(1 for _, c in out.items() if c[1]) == 4


def test_connected_components_strict_raises_on_max_iter(spark):
    """ADVICE round 2: exhausting max_iter with labels still moving must be
    loud — an unconverged labeling silently splits dup groups."""
    import pytest
    # a chain long enough that 1 round (even with halving) cannot converge
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(30)], "id_a long, id_b long"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(pairs, max_iter=1, strict=True)
    # best-effort mode still returns a (partial) labeling
    out = connected_components(pairs, max_iter=1, strict=False)
    assert out.count() == 31
