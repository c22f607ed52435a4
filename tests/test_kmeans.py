"""First-principles check of fixed-point k-means against a pure-python
model of the identical integer recurrence."""

from __future__ import annotations

from cassandra_sstable_to_protocolbuf_spark.operators.ml import (
    SCALE, kmeans_fixedpoint)


def _model(vecs: dict[int, list[float]], n_iter: int, mod: int, rem: int):
    q = {i: [int(round(x * SCALE)) for x in v] for i, v in vecs.items()}
    cents = {i: list(q[i]) for i in q if i % mod == rem}

    def dist(a, b):
        return sum((x - y) * (x - y) for x, y in zip(a, b))

    def assign():
        out = {}
        for i, v in q.items():
            best = min((dist(v, c), cid) for cid, c in cents.items())
            out[i] = best[1], best[0]
        return out

    def trunc_div(a, b):  # BIGINT DIV: truncate toward zero
        r = abs(a) // b
        return r if a >= 0 else -r

    for _ in range(n_iter):
        a = assign()
        members: dict[int, list[int]] = {}
        for i, (cid, _d) in a.items():
            members.setdefault(cid, []).append(i)
        cents = {cid: [trunc_div(sum(q[i][d] for i in ms), len(ms))
                       for d in range(len(next(iter(q.values()))))]
                 for cid, ms in members.items()}
    return assign()


def test_matches_dict_model(spark):
    # two obvious blobs + an outlier, 3 seed ids (0, 5, 10 with mod 5
    # rem 0), 4-dim vectors incl. negative coords (exercises DIV-vs-floor)
    vecs = {
        0: [0.1, 0.1, -0.2, 0.0], 1: [0.12, 0.09, -0.21, 0.01],
        2: [0.11, 0.11, -0.19, -0.02], 5: [-0.4, 0.3, 0.4, -0.3],
        6: [-0.41, 0.29, 0.41, -0.31], 7: [-0.39, 0.31, 0.39, -0.29],
        10: [0.5, -0.5, 0.5, -0.5], 11: [0.49, -0.51, 0.52, -0.48],
    }
    rows = [(i, [float(x) for x in v]) for i, v in vecs.items()]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    # quantization must start from the float32 values Spark stores
    import numpy as np
    vecs32 = {i: [float(np.float32(x)) for x in v] for i, v in vecs.items()}
    want = _model(vecs32, 2, mod=5, rem=0)
    got = {r.vec_id: (r.cluster_id, r.dist_sq)
           for r in kmeans_fixedpoint(df, n_iter=2, centroid_mod=5,
                                      centroid_rem=0).collect()}
    assert got == want
    # blob members co-cluster
    assert got[0][0] == got[1][0] == got[2][0]
    assert got[5][0] == got[6][0] == got[7][0]
    assert got[10][0] == got[11][0]
