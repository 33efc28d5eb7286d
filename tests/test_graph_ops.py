"""PageRank over near-dup pair graphs: hand-computed fixtures (the
query has no SQL oracle — float summation order is engine-dependent —
so semantics are pinned here)."""

from __future__ import annotations

import pytest

from firmable_company_data_pipeline_spark.operators.graph import pagerank


def _pairs(spark, rows):
    return spark.createDataFrame(rows, "id_a long, id_b long")


def _reference_pagerank(edges, iters, d=0.85):
    nodes = sorted({u for e in edges for u in e})
    und = set()
    for a, b in edges:
        und.add((a, b))
        und.add((b, a))
    deg = {u: sum(1 for s, _ in und if s == u) for u in nodes}
    n = len(nodes)
    pr = {u: 1 / n for u in nodes}
    for _ in range(iters):
        pr = {
            v: (1 - d) / n + d * sum(pr[s] / deg[s] for s, t in und if t == v)
            for v in nodes
        }
    return pr


@pytest.mark.parametrize("iters", [1, 5])
def test_pagerank_matches_reference(spark, iters):
    edges = [(1, 2), (2, 3), (3, 4), (1, 3)]
    out = {r["id"]: r["pagerank"] for r in pagerank(_pairs(spark, edges), iters=iters).collect()}
    ref = _reference_pagerank(edges, iters)
    assert set(out) == set(ref)
    for u in ref:
        assert out[u] == pytest.approx(ref[u], abs=1e-5)


def test_pagerank_hub_scores_highest(spark):
    # star: 1 connected to 2..5 — the hub must outrank the leaves
    edges = [(1, i) for i in range(2, 6)]
    out = {r["id"]: r["pagerank"] for r in pagerank(_pairs(spark, edges)).collect()}
    assert out[1] == max(out.values())
    leaf_vals = {out[i] for i in range(2, 6)}
    assert len(leaf_vals) == 1  # symmetric leaves tie exactly


def test_pagerank_mass_conserved(spark):
    edges = [(1, 2), (3, 4), (2, 3)]
    out = pagerank(_pairs(spark, edges), iters=8).collect()
    assert sum(r["pagerank"] for r in out) == pytest.approx(1.0, abs=1e-4)


def test_triangle_count_known_graph(spark):
    from firmable_company_data_pipeline_spark.operators.graph import triangle_count

    # K4 on {1,2,3,4} (4 triangles, clustering 1.0 everywhere) plus a
    # pendant 4-5 edge and an isolated edge 6-7.
    edges = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4), (4, 5), (6, 7)]
    pairs = spark.createDataFrame(edges, "id_a long, id_b long")
    out = {r["id"]: r for r in triangle_count(pairs).collect()}
    for n in (1, 2, 3):
        assert out[n]["n_triangles"] == 3 and out[n]["clustering"] == 1.0
    assert out[4]["degree"] == 4 and out[4]["n_triangles"] == 3
    assert out[4]["clustering"] == round(2 * 3 / (4 * 3), 6)
    assert out[5]["n_triangles"] == 0 and out[5]["clustering"] == 0.0
    assert out[6]["n_triangles"] == 0 and out[7]["degree"] == 1
    # total triangle count: sum of per-node counts = 3 * 4 triangles
    assert sum(r["n_triangles"] for r in out.values()) == 12


# ---------------------------------------------------------------------------
# Level-synchronous BFS (round 12).
def test_bfs_levels_chain_distances(spark):
    from firmable_company_data_pipeline_spark.operators.graph import bfs_levels

    # chain 1-2-3-4-5 plus an isolated seed 9 and an unreachable 7-8
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (7, 8)], "src long, dst long"
    )
    seeds = spark.createDataFrame([(1,), (9,)], "id long")
    out = {r.id: r.dist for r in bfs_levels(edges, seeds, max_hops=3).collect()}
    assert out == {1: 0, 9: 0, 2: 1, 3: 2, 4: 3}  # 5 is 4 hops: absent


def test_bfs_levels_undirected_and_min_dist(spark):
    from firmable_company_data_pipeline_spark.operators.graph import bfs_levels

    # edges listed one-way only; triangle gives two routes — min wins
    edges = spark.createDataFrame(
        [(3, 1), (1, 2), (2, 3)], "src long, dst long"
    )
    seeds = spark.createDataFrame([(1,)], "id long")
    out = {r.id: r.dist for r in bfs_levels(edges, seeds, max_hops=3).collect()}
    assert out == {1: 0, 2: 1, 3: 1}
