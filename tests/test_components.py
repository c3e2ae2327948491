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


def test_pointer_doubling_beats_diameter(spark, monkeypatch):
    # a 24-edge path under a 8-round budget: pure min-propagation needs 24
    # rounds (one hop each) and would raise; pointer doubling halves the
    # remaining chain per round, so this MUST converge inside the budget
    # (threshold forced to 0: the test targets the FIXPOINT path)
    import vacancy_analyser_spark.operators.components as comps

    monkeypatch.setattr(comps, "LOCAL_MAX_EDGES", 0)
    df = spark.createDataFrame([(i, i + 1) for i in range(24)], "a_id long, b_id long")
    comp = {r["id"]: r["component"] for r in connected_components(df, max_rounds=8).collect()}
    assert set(comp.values()) == {0}
    assert len(comp) == 25


def test_nonconvergence_raises_not_lies(spark, monkeypatch):
    # an impossible budget must raise, never return fractured labels
    # (fixpoint path forced: the local union-find has no round budget)
    import pytest

    import vacancy_analyser_spark.operators.components as comps

    monkeypatch.setattr(comps, "LOCAL_MAX_EDGES", 0)
    df = spark.createDataFrame([(i, i + 1) for i in range(24)], "a_id long, b_id long")
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(df, max_rounds=1)


def test_edge_direction_irrelevant(spark):
    # components are over the UNDIRECTED graph: reversed pairs, same answer
    comp = _components(spark, [(5, 3), (3, 9), (9, 7)])
    assert comp == {3: 3, 5: 3, 7: 3, 9: 3}


def _union_find(edges):
    """Reference labeling: textbook union-find, min id per component."""
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {x: find(x) for x in parent}


def test_random_graphs_match_union_find(spark, monkeypatch):
    """Randomized shapes vs a reference union-find — each example spins
    Spark jobs, so examples are few and tiny (the value is the shapes:
    self-merging stars, bridges, duplicate and self-referential edges).
    Threshold forced to 0 so the DISTRIBUTED fixpoint is what's compared
    (the local path IS a union-find — comparing it would be vacuous)."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    import vacancy_analyser_spark.operators.components as comps

    monkeypatch.setattr(comps, "LOCAL_MAX_EDGES", 0)

    ids = st.integers(min_value=0, max_value=15)
    edges = st.lists(st.tuples(ids, ids), min_size=1, max_size=12)

    @settings(max_examples=6, deadline=None, suppress_health_check=list(HealthCheck))
    @given(e=edges)
    def check(e):
        assert _components(spark, e) == _union_find(e)

    check()


def test_components_size_dispatch_paths_agree(spark, monkeypatch):
    """The driver union-find (default at these sizes) and the distributed
    fixpoint must label identically on the same graphs — the dispatch is
    a physical choice, not a semantic one (ntile_quartiles' rule)."""
    import vacancy_analyser_spark.operators.components as comps

    graphs = [
        [(1, 2), (2, 3), (3, 4), (10, 11), (10, 12), (11, 12), (20, 21)],
        [(i, i + 1) for i in range(12)],
        [(5, 3), (3, 9), (9, 7), (7, 7), (3, 9)],
    ]
    for edges in graphs:
        df = spark.createDataFrame(edges, "a_id long, b_id long")
        local = {r["id"]: r["component"] for r in connected_components(df).collect()}
        monkeypatch.setattr(comps, "LOCAL_MAX_EDGES", 0)
        fixpoint = {r["id"]: r["component"] for r in connected_components(df).collect()}
        monkeypatch.undo()
        assert local == fixpoint
