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


def test_pagerank_unpersists_its_caches(spark, monkeypatch):
    """ADVICE r8 regression: pagerank persisted its edge and node frames
    and never released them, leaking cached blocks across repeated calls
    in a long-lived session (the bfs/sssp/kcore siblings all unpersist
    in finally). Every frame pagerank persists must be unpersisted by
    the time it returns — localCheckpoint blocks are excluded (they are
    context-cleaner-managed and the final result rides one)."""
    DataFrame = type(spark.range(1))  # the concrete (classic) class

    persisted, unpersisted = [], []
    orig_p, orig_u = DataFrame.persist, DataFrame.unpersist

    def spy_p(self, *a, **k):
        persisted.append(id(self))
        return orig_p(self, *a, **k)

    def spy_u(self, *a, **k):
        unpersisted.append(id(self))
        return orig_u(self, *a, **k)

    monkeypatch.setattr(DataFrame, "persist", spy_p)
    monkeypatch.setattr(DataFrame, "unpersist", spy_u)
    ranks = _ranks(spark, [(1, 2), (2, 3), (3, 1)], iters=2)
    assert len(ranks) == 3
    assert persisted, "pagerank should persist its shared subtrees"
    assert set(persisted) <= set(unpersisted)


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


# ---------------------------------------------------------------------------
# connected_components_star (large-star/small-star, O(log n) rounds)
# ---------------------------------------------------------------------------


def _star_cc(spark, rows, **kw):
    from qcardia_data_spark.functions.graph import connected_components_star

    edges = spark.createDataFrame(rows, "src long, dst long")
    return {
        r["node"]: r["component"]
        for r in connected_components_star(edges, **kw).collect()
    }


def test_star_cc_two_components(spark):
    got = _star_cc(spark, [(1, 2), (2, 3), (10, 11), (3, 1)])
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_star_cc_single_edge_and_self_loop(spark):
    assert _star_cc(spark, [(5, 7), (9, 9)]) == {5: 5, 7: 5}


def test_star_cc_empty(spark):
    assert _star_cc(spark, []) == {}


def test_star_cc_long_path_converges_in_log_rounds(spark):
    """The case min-label propagation CANNOT do: a 3000-node path
    (diameter 2999). Star alternations reach the all-zero labeling in
    ~log2(n)+2 rounds (the min-anchor gap doubles per alternation;
    measured: 9 rounds for a 512-path) + 1 fixpoint-verify round — 16
    bounds it with slack. Label propagation would need 3000 rounds."""
    n = 3000
    rows = [(i, i + 1) for i in range(n - 1)]
    got = _star_cc(spark, rows, max_rounds=16)
    assert len(got) == n and set(got.values()) == {0}


def test_star_cc_matches_label_propagation_on_shallow_graph(spark):
    """Same labeling contract as dedup.connected_components on the graphs
    that operator serves (shallow near-dup clusters)."""
    import hashlib

    from qcardia_data_spark.functions.dedup import connected_components

    # deterministic sparse random graph: 120 nodes, ~150 md5-derived edges
    rows = []
    for i in range(150):
        h = hashlib.md5(f"e{i}".encode()).hexdigest()
        a, b = int(h[:6], 16) % 120, int(h[6:12], 16) % 120
        if a != b:
            rows.append((a, b))
    star = _star_cc(spark, rows)
    pairs = spark.createDataFrame(rows, "a long, b long")
    lp = {
        r["node"]: r["component"]
        for r in connected_components(pairs).collect()
    }
    assert star == lp


def test_star_cc_unconverged_refuses_loudly(spark):
    import pytest as _pytest

    from qcardia_data_spark.functions.graph import connected_components_star

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(199)], "src long, dst long"
    )
    with _pytest.raises(ValueError, match="fixpoint"):
        connected_components_star(edges, max_rounds=1)


def test_star_cc_spec_op(spark, tmp_path):
    from qcardia_data_spark.plans.spec import compile_pipeline

    pq = str(tmp_path / "edges_pq")
    spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "src long, dst long"
    ).write.parquet(pq)
    got = {
        r["node"]: r["component"]
        for r in compile_pipeline(
            spark,
            [{"op": "source", "path": pq}, {"op": "connected_components"}],
        ).collect()
    }
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


# ---------------------------------------------------------------------------
# bfs_hops
# ---------------------------------------------------------------------------


def test_bfs_hops_chain_and_bound(spark):
    from qcardia_data_spark.functions.graph import bfs_hops

    # 0 -> 1 -> 2 -> 3 -> 4, plus a shortcut 0 -> 3 and an island 9 -> 10
    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (3, 4), (0, 3), (9, 10)], ["src", "dst"]
    )
    srcs = spark.createDataFrame([(0,)], ["node"])
    got = {r["node"]: r["hops"] for r in bfs_hops(edges, srcs).collect()}
    assert got == {0: 0, 1: 1, 2: 2, 3: 1, 4: 2}  # shortcut wins; island absent
    # bound truncates: max_hops=1 reaches only direct neighbors
    got1 = {r["node"]: r["hops"]
            for r in bfs_hops(edges, srcs, max_hops=1).collect()}
    assert got1 == {0: 0, 1: 1, 3: 1}


def test_bfs_hops_multi_source_min(spark):
    from qcardia_data_spark.functions.graph import bfs_hops

    edges = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 3), (5, 3)], ["src", "dst"]
    )
    srcs = spark.createDataFrame([(0,), (5,)], ["node"])
    got = {r["node"]: r["hops"] for r in bfs_hops(edges, srcs).collect()}
    assert got[3] == 1  # reached from 5 in 1 hop, not from 0 in 3


def test_bfs_hops_cycle_terminates(spark):
    from qcardia_data_spark.functions.graph import bfs_hops

    edges = spark.createDataFrame([(0, 1), (1, 2), (2, 0)], ["src", "dst"])
    srcs = spark.createDataFrame([(0,)], ["node"])
    got = {r["node"]: r["hops"] for r in bfs_hops(edges, srcs, max_hops=10).collect()}
    assert got == {0: 0, 1: 1, 2: 2}  # visited set stops the cycle


def test_sssp_rounds_prefers_cheap_long_path(spark):
    from qcardia_data_spark.functions.graph import sssp_rounds

    # direct hop costs 10; the 3-edge detour costs 3 — SSSP must take it
    # (BFS would stop at the 1-hop answer)
    edges = spark.createDataFrame(
        [(0, 9, 10), (0, 1, 1), (1, 2, 1), (2, 9, 1), (9, 5, 2)],
        ["src", "dst", "w"],
    )
    srcs = spark.createDataFrame([(0,)], ["node"])
    got = {r["node"]: r["cost"] for r in sssp_rounds(edges, srcs, rounds=6).collect()}
    assert got == {0: 0, 1: 1, 2: 2, 9: 3, 5: 5}
    # bounded rounds: with 1 round only the direct edges are reachable
    got1 = {r["node"]: r["cost"] for r in sssp_rounds(edges, srcs, rounds=1).collect()}
    assert got1 == {0: 0, 1: 1, 9: 10}


def test_sssp_rejects_negative_weights(spark):
    import pytest as _pytest

    from qcardia_data_spark.functions.graph import sssp_rounds

    edges = spark.createDataFrame([(0, 1, -5)], ["src", "dst", "w"])
    srcs = spark.createDataFrame([(0,)], ["node"])
    with _pytest.raises(ValueError, match="negative"):
        sssp_rounds(edges, srcs)


def test_kcore_peels_tail_and_keeps_core(spark):
    from qcardia_data_spark.functions.graph import kcore_rounds

    # triangle 1-2-3 (2-core) with a pendant chain 3-4-5 that must peel
    # away over TWO rounds (5 first, then 4) — and parallel/reversed
    # edges must not inflate degrees
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 1), (1, 3), (3, 4), (4, 5), (5, 4)],
        ["src", "dst"],
    )
    got = {r["node"]: r["degree"]
           for r in kcore_rounds(edges, k=2, rounds=6).collect()}
    assert got == {1: 2, 2: 2, 3: 2}
    # one round only: 5 peels (deg 1) but 4 still counts 5 -> survives
    one = {r["node"] for r in kcore_rounds(edges, k=2, rounds=1).collect()}
    assert one == {1, 2, 3, 4}


def test_kcore_empty_when_no_core(spark):
    from qcardia_data_spark.functions.graph import kcore_rounds

    chain = spark.createDataFrame([(1, 2), (2, 3), (3, 4)], ["src", "dst"])
    assert kcore_rounds(chain, k=2, rounds=6).count() == 0


def test_reliable_dir_equals_localcheckpoint_on_every_loop(spark, tmp_path):
    """r13 (VERDICT r12 #4 extended past the CC fixpoint): every iterative
    family's per-round state can persist to parquet under a caller path
    instead of executor-block localCheckpoints — values identical. The
    BFS case matters most: it materializes TWO state streams per level
    (frontier + distance table), so each stream alternates its own
    subpath pair (a shared pair would overwrite files still being read)."""
    from pyspark.sql import functions as F

    from qcardia_data_spark.functions.graph import (
        bfs_hops,
        kcore_rounds,
        pagerank,
        sssp_rounds,
    )
    from qcardia_data_spark.plans.spec import compile_pipeline

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(30)] + [(5, 0), (12, 3), (20, 7)],
        ["src", "dst"],
    )
    srcs = edges.select(F.col("src").alias("node")).filter("node % 10 = 0").distinct()
    wedges = edges.withColumn("w", (F.col("src") % 5 + 1).cast("long"))

    def canon(df):
        return sorted(tuple(r) for r in df.collect())

    assert canon(pagerank(edges, iters=3, reliable_dir=str(tmp_path / "pr"))) == \
        canon(pagerank(edges, iters=3))
    assert canon(bfs_hops(edges, srcs, max_hops=6,
                          reliable_dir=str(tmp_path / "bfs"))) == \
        canon(bfs_hops(edges, srcs, max_hops=6))
    assert canon(sssp_rounds(wedges, srcs, rounds=5,
                             reliable_dir=str(tmp_path / "sssp"))) == \
        canon(sssp_rounds(wedges, srcs, rounds=5))
    assert canon(kcore_rounds(edges, k=2, rounds=4,
                              reliable_dir=str(tmp_path / "kc"))) == \
        canon(kcore_rounds(edges, k=2, rounds=4))

    # r15 (VERDICT r14 #5): the caller-owned cleanup tool — repeated
    # invocations sharing a reliable_dir leave one run_* namespace each;
    # list_runs sees them oldest-first, prune_runs(keep=1) deletes all
    # but the newest, and the kept run's parquet remains readable.
    from qcardia_data_spark.functions.graph import list_runs, prune_runs

    shared = str(tmp_path / "pr")  # the pagerank dir above already has 1 run
    pagerank(edges, iters=3, reliable_dir=shared).collect()
    runs = list_runs(spark, shared)
    assert len(runs) == 2 and all(r.startswith("run_") for r in runs)
    deleted = prune_runs(spark, shared, keep=1)
    assert deleted == runs[:1]
    assert list_runs(spark, shared) == runs[1:]
    assert prune_runs(spark, shared, keep=5) == []  # keep > live: no-op
    assert prune_runs(spark, shared, keep=0) == runs[1:]
    assert list_runs(spark, shared) == []
    assert list_runs(spark, str(tmp_path / "nonexistent")) == []
    with pytest.raises(ValueError, match="keep"):
        prune_runs(spark, shared, keep=-1)

    # spec knob reaches the module (pagerank as the representative)
    epath = str(tmp_path / "edges_rel")
    edges.write.parquet(epath)
    spec_pr = compile_pipeline(
        spark,
        [{"op": "source", "path": epath},
         {"op": "pagerank", "src": "src", "dst": "dst", "iters": 3,
          "reliable_dir": str(tmp_path / "pr_spec")}],
        None,
    )
    assert canon(spec_pr) == canon(pagerank(edges, iters=3))
    import glob as _glob
    import os as _os

    # per-invocation run_* namespace since r14 (ADVICE r13)
    assert _glob.glob(str(tmp_path / "pr_spec" / "run_*" / "ranks_0"))
