"""First-principles checks of fixed-point PageRank against a dict-model
reference implementing the identical integer recurrence."""

from __future__ import annotations

from cassandra_sstable_to_protocolbuf_spark.operators.graph import (
    BASE, DAMP_PCT, pagerank_fixedpoint)


def _model(edges: list[tuple[int, int]], n_iter: int) -> dict[int, int]:
    nodes = {n for e in edges for n in e}
    deg: dict[int, int] = {}
    for s, _ in edges:
        deg[s] = deg.get(s, 0) + 1
    ranks = {n: BASE for n in nodes}
    for _ in range(n_iter):
        recv = {n: 0 for n in nodes}
        for s, d in edges:
            recv[d] += ranks[s] // deg[s]
        ranks = {n: (100 - DAMP_PCT) * BASE // 100
                 + DAMP_PCT * recv[n] // 100 for n in nodes}
    return ranks


def _spark_ranks(spark, edges, n_iter):
    df = spark.createDataFrame(edges, "src long, dst long")
    out = pagerank_fixedpoint(df, n_iter=n_iter)
    return {r.node: r.rank_fp for r in out.collect()}


def test_matches_dict_model_on_star_graph(spark):
    # hub 0 <-> leaves 1..5: the hub must outrank every leaf
    edges = [(0, i) for i in range(1, 6)] + [(i, 0) for i in range(1, 6)]
    got = _spark_ranks(spark, edges, 3)
    want = _model(edges, 3)
    assert got == want
    assert all(got[0] > got[i] for i in range(1, 6))


def test_matches_dict_model_on_asymmetric_digraph(spark):
    # directed chain with a cycle and a fan-in: exercises unequal
    # degrees, fan-in summation, and nodes with zero in-links
    edges = [(1, 2), (2, 3), (3, 1), (4, 3), (5, 3), (1, 3)]
    got = _spark_ranks(spark, edges, 4)
    want = _model(edges, 4)
    assert got == want
    # 4 and 5 have no in-links: pure teleport mass
    assert got[4] == got[5] == (100 - DAMP_PCT) * BASE // 100
    # 3 is the fan-in hub
    assert got[3] == max(got.values())


def test_regular_graph_stays_uniform(spark):
    # triangle, symmetric: perfectly regular, so rank stays ~BASE for
    # every node at every iteration (up to integer-division dust)
    tri = [(0, 1), (1, 2), (2, 0), (1, 0), (2, 1), (0, 2)]
    got = _spark_ranks(spark, tri, 3)
    want = _model(tri, 3)
    assert got == want
    assert len(set(got.values())) == 1
    assert abs(next(iter(got.values())) - BASE) < 100
