"""Unit tests for functions/graph.py::pagerank — hand-computable graphs
pin the iteration formula, dangling-mass redistribution, and parallel-edge
weighting; the registry query's oracle (3 unrolled SQL iterations) covers
cross-engine value parity."""
from __future__ import annotations

import pytest

from qcardia_data_spark.functions.graph import pagerank


def _ranks(spark, rows, **kw):
    edges = spark.createDataFrame(rows, "src long, dst long")
    return {r["node"]: r["rank"] for r in pagerank(edges, **kw).collect()}


def test_two_node_cycle_is_uniform(spark):
    # symmetric graph: ranks stay at the uniform fixpoint exactly
    r = _ranks(spark, [(1, 2), (2, 1)], iters=5)
    assert r[1] == pytest.approx(0.5, abs=1e-12)
    assert r[2] == pytest.approx(0.5, abs=1e-12)


def test_mass_is_conserved_with_dangling_node(spark):
    # 1->2, 2->3, 3 dangling: total mass must stay 1 every iteration
    r = _ranks(spark, [(1, 2), (2, 3)], iters=4)
    assert sum(r.values()) == pytest.approx(1.0, abs=1e-9)
    # the chain end accumulates more than the start
    assert r[3] > r[1]


def test_one_iteration_matches_hand_computation(spark):
    # star: 1->2, 3->2 (N=3, d=0.875). After one iteration:
    #   r(2) = 0.125/3 + 0.875*(1/3 + 1/3) = 0.125/3 + 0.875*2/3
    #   r(1) = r(3) = 0.125/3 (no in-edges, no dangling nodes... node 2
    #   IS dangling: dang = 1/3 redistributed to all)
    r = _ranks(spark, [(1, 2), (3, 2)], iters=1)
    n = 3
    dang = 1 / 3  # node 2 has no out-edges
    base = 0.125 / n + 0.875 * (dang / n)
    assert r[1] == pytest.approx(base, abs=1e-12)
    assert r[3] == pytest.approx(base, abs=1e-12)
    assert r[2] == pytest.approx(base + 0.875 * (1 / 3 + 1 / 3), abs=1e-12)


def test_parallel_edges_weight_contributions(spark):
    # 1 has two edges to 2 and one to 3: 2 receives 2/3 of 1's mass
    r1 = _ranks(spark, [(1, 2), (1, 2), (1, 3), (2, 1), (3, 1)], iters=3)
    assert r1[2] > r1[3]


def test_rank_sum_is_one_on_real_edges(spark, sf_dir):
    from qcardia_data_spark.queries import QUERIES

    df = QUERIES["ev_handoff_pagerank"][0](spark, sf_dir)
    total = sum(r["rank_e9"] for r in df.collect())
    assert total == pytest.approx(1_000_000_000, rel=1e-6)


def test_triangle_count_hand_graph(spark):
    from qcardia_data_spark.functions.graph import triangle_count

    # K4 minus edge (3,4): triangles {1,2,3} and {1,2,4} — nodes 1,2 in
    # two each, nodes 3,4 in one; direction/parallel edges collapse
    edges = spark.createDataFrame(
        [(1, 2), (2, 1), (2, 3), (1, 3), (1, 4), (4, 2), (1, 4)],
        "src long, dst long",
    )
    got = {r["node"]: r["n_triangles"] for r in triangle_count(edges).collect()}
    assert got == {1: 2, 2: 2, 3: 1, 4: 1}


def test_triangle_free_graph_is_empty(spark):
    from qcardia_data_spark.functions.graph import triangle_count

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 1)], "src long, dst long"  # C4
    )
    assert triangle_count(edges).count() == 0
