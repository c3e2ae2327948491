"""Connected-components operator: the pairs→groups step of the dedup
pipeline (operators/components.py). The registered near_dup_groups query
is value-hash checked against the recursive-CTE oracle by
tests/test_oracle_parity.py; these pin the operator's own contract."""

from __future__ import annotations

from vacancy_analyser_spark.operators.components import connected_components


def _components(spark, edges):
    df = spark.createDataFrame(edges, "a_id long, b_id long")
    return {r["id"]: r["component"] for r in connected_components(df).collect()}


def test_chain_clique_and_pair(spark):
    # chain 1-2-3-4 (diameter > 1 forces multiple rounds), clique {10,11,12},
    # isolated pair {20,21}
    comp = _components(
        spark,
        [(1, 2), (2, 3), (3, 4), (10, 11), (10, 12), (11, 12), (20, 21)],
    )
    assert comp == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 12: 10, 20: 20, 21: 20}


def test_long_chain_converges(spark):
    # a 12-vertex path — worst diameter for min-propagation; the fixpoint
    # must still label every vertex with the chain head
    comp = _components(spark, [(i, i + 1) for i in range(12)])
    assert set(comp.values()) == {0}
    assert len(comp) == 13


def test_edge_direction_irrelevant(spark):
    # components are over the UNDIRECTED graph: reversed pairs, same answer
    comp = _components(spark, [(5, 3), (3, 9), (9, 7)])
    assert comp == {3: 3, 5: 3, 7: 3, 9: 3}
