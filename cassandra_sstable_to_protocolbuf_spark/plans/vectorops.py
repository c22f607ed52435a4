"""Query plans + oracles for similarity search over the embeddings table.

Cross-engine note: the Spark left-fold dot product (F.aggregate over
zip_with) and DuckDB's list_sum/list_transform are bit-identical in
double precision (verified empirically: max abs diff 0.0 over the full
corpus), so the raw cosine double is safe in hash-compared output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cassandra_sstable_to_protocolbuf_spark.operators.similarity import (
    ann_lsh_topk, ann_lsh_topk_oracle_sql, cosine_topk, ivf_topk,
    ivf_topk_oracle_sql, lsh_dup_pairs, lsh_dup_pairs_oracle_sql)


def _emb(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cassandra_sstable_to_protocolbuf_spark.session import read_base_table
    return read_base_table(spark, f"{sf_dir}/embeddings.parquet")


def emb_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _emb(spark, sf_dir)
    queries = (emb.filter(F.col("vec_id") % 25 == 0)
               .select(F.col("vec_id").alias("qid"), "embedding"))
    return cosine_topk(emb, queries, k=5)


EMB_COSINE_TOPK_SQL = """
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id % 25 = 0),
scored AS (
  SELECT qid, vec_id AS nid,
         list_sum(list_transform(list_zip(qv, v), p -> p[1] * p[2]))
         / (sqrt(list_sum(list_transform(qv, x -> x * x)))
            * sqrt(list_sum(list_transform(v, x -> x * x)))) AS cosine
  FROM q, e WHERE vec_id <> qid
)
SELECT qid, rank, nid, cosine FROM (
  SELECT qid, nid, cosine,
         ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cosine DESC, nid ASC) AS rank
  FROM scored
) t WHERE rank <= 5
"""


def emb_centroid_per_label(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label mean-vector norm + count: array aggregation demo.

    Avoids emitting raw averaged doubles per dimension (summation order
    across rows is engine-dependent); instead emits count and the exact
    per-label sum of the FIRST component computed in decimal.
    """
    emb = _emb(spark, sf_dir)
    first = F.get(F.transform("embedding", lambda x: x.cast("double")), 0)
    return (emb.groupBy("label")
            .agg(F.count(F.lit(1)).alias("n_vecs"),
                 F.sum(first.cast("decimal(28,10)")).cast("double").alias("sum_first_dim")))


EMB_CENTROID_SQL = """
SELECT label, COUNT(*) AS n_vecs,
       CAST(SUM(CAST(CAST(embedding[1] AS DOUBLE) AS DECIMAL(28,10))) AS DOUBLE) AS sum_first_dim
FROM embeddings
GROUP BY label
"""


def emb_cosine_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: RP-LSH bucketed candidates +
    exact cosine verify.

    The primary (gated, benched) embedding-dedup operator. Candidate pairs
    come from equi-joins on 24 seeded sign-LSH signatures (~10% of all
    pairs on this corpus) and only candidates pay the exact cosine, so
    cost scales with bucket co-occupancy, not corpus^2. Deterministic at
    fixed seed; the DuckDB oracle reproduces the identical bucketing (the
    +-1 plane matrix is embedded in the SQL).

    Recall vs the exact twin (`emb_cosine_all_pairs`, pytest-only) is
    ~0.86 at this corpus's unusually weak 0.45 threshold (the true pairs
    sit at ~63 deg, barely off the ~90 deg background -- the provably
    hard regime for any sign-LSH): multi-probe (one lowest-margin bit
    flip per table) recovers most hamming-1/2 signature near-misses that
    held single-probe recall to ~0.55. In the realistic near-dup regime
    (cosine >= 0.9) the config exceeds 0.95 recall
    (tests/test_approx_quality.py::test_lsh_dup_pairs_planted_recall).
    """
    emb = _emb(spark, sf_dir)
    return lsh_dup_pairs(emb, threshold=0.45)


EMB_COSINE_DUP_SQL = lsh_dup_pairs_oracle_sql(threshold=0.45)


def emb_cosine_all_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact all-pairs twin of emb_cosine_dup_pairs (O(n^2) -- pytest
    recall oracle only, deliberately NOT in the gated catalog)."""
    from cassandra_sstable_to_protocolbuf_spark.session import widen

    emb = _emb(spark, sf_dir)
    # norms are per-row: compute them ONCE in their own projections
    # (higher-order functions are interpreted; recomputing the norm
    # inside the pairwise expression would redo 2x64 multiplies per pair
    # -- measured 33s -> ~6s at sf0.1)
    e = widen(emb).select("vec_id", F.transform(
        "embedding", lambda x: x.cast("double")).alias("v"))
    e = e.select(
        "vec_id", "v",
        F.sqrt(F.aggregate(F.transform("v", lambda x: x * x),
                           F.lit(0.0), lambda acc, x: acc + x)).alias("nrm"))
    a = e.select(F.col("vec_id").alias("id_a"), F.col("v").alias("va"),
                 F.col("nrm").alias("na"))
    b = e.select(F.col("vec_id").alias("id_b"), F.col("v").alias("vb"),
                 F.col("nrm").alias("nb"))
    dot = F.aggregate(F.zip_with("va", "vb", lambda x, y: x * y),
                      F.lit(0.0), lambda acc, x: acc + x)
    return (a.join(b, F.col("id_a") < F.col("id_b"))
            .select("id_a", "id_b",
                    (dot / (F.col("na") * F.col("nb"))).alias("cosine"))
            .filter(F.col("cosine") >= 0.45))


EMB_COSINE_ALL_PAIRS_SQL = """
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings)
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       list_sum(list_transform(list_zip(a.v, b.v), p -> p[1] * p[2]))
       / (sqrt(list_sum(list_transform(a.v, x -> x * x)))
          * sqrt(list_sum(list_transform(b.v, x -> x * x)))) AS cosine
FROM e a JOIN e b ON a.vec_id < b.vec_id
WHERE list_sum(list_transform(list_zip(a.v, b.v), p -> p[1] * p[2]))
      / (sqrt(list_sum(list_transform(a.v, x -> x * x)))
         * sqrt(list_sum(list_transform(b.v, x -> x * x)))) >= 0.45
"""


def emb_ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate ANN via sign-LSH bucketing + exact rescoring of
    bucket-mates. Deterministic at the fixed seed, so it is fully
    hash-gated: the DuckDB oracle reproduces the identical bucketing
    from the same literal plane matrix (recall vs the exact top-k is
    measured separately in tests/test_approx_quality.py)."""
    emb = _emb(spark, sf_dir)
    queries = (emb.filter(F.col("vec_id") % 25 == 0)
               .select(F.col("vec_id").alias("qid"), "embedding"))
    # multi-probe (all 4 Hamming-1 buckets per table): 5x the query-side
    # probes but NO extra corpus-side signature cost; measured recall on
    # the near-isotropic corpus rises from ~0.5 single-probe to ~0.7+
    # (pinned in tests/test_approx_quality.py)
    return ann_lsh_topk(emb, queries, k=5, probe_flips=4)


EMB_ANN_LSH_SQL = ann_lsh_topk_oracle_sql(query_pred="vec_id % 25 = 0", k=5,
                                          probe_flips=4)


def emb_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style coarse-quantized ANN: deterministic centroid cells,
    nprobe nearest cells rescored exactly. The codebook alternative to
    the sign-LSH path (emb_ann_lsh); hash-gated like it."""
    emb = _emb(spark, sf_dir)
    queries = (emb.filter(F.col("vec_id") % 25 == 0)
               .select(F.col("vec_id").alias("qid"), "embedding"))
    return ivf_topk(emb, queries, k=5)


EMB_IVF_SQL = ivf_topk_oracle_sql(query_pred="vec_id % 25 = 0", k=5)


def emb_quantize_int8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Symmetric int8 quantization audit: per-vector absmax scale, each
    element mapped to floor(x/scale*127 + 0.5). Emits scalar summaries
    (sum / min / max / nonzero count of the quantized codes) rather than
    the code array -- array columns crash the gate's canonicalizer, and
    the scalars pin the same bytes.

    Scale design: a narrow per-row map (one transform + four folds), no
    shuffle; float->double casts are exact so both engines agree
    bit-for-bit. At 100 TB this is scan-bandwidth-bound and pairs with
    the int8 storage-size estimate a training pipeline needs.
    """
    emb = _emb(spark, sf_dir)
    # own projection per expensive expression: interpreted HOFs re-evaluate
    # inline subexpressions per use (see session.py perf notes)
    base = emb.select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("v"))
    scaled = (base.withColumn("scale", F.array_max(F.transform("v", F.abs)))
              .filter(F.col("scale") > 0))
    return (scaled
            .withColumn("q", F.transform(
                "v", lambda x: F.floor(x / F.col("scale") * 127 + F.lit(0.5))
                .cast("long")))
            .select("vec_id", "scale",
                    F.aggregate("q", F.lit(0).cast("long"),
                                lambda a, x: a + x).alias("q_sum"),
                    F.array_min("q").alias("q_min"),
                    F.array_max("q").alias("q_max"),
                    F.size(F.filter("q", lambda x: x != 0)).cast("long")
                    .alias("n_nonzero")))


EMB_QUANTIZE_INT8_SQL = """
WITH e AS (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
           FROM embeddings),
s AS (SELECT vec_id, v, list_aggregate(list_transform(v, x -> abs(x)), 'max') AS scale
      FROM e),
q AS (SELECT vec_id, scale,
             list_transform(v, x -> CAST(floor(x / scale * 127 + 0.5) AS BIGINT)) AS qs
      FROM s WHERE scale > 0)
SELECT vec_id, scale,
       CAST(list_sum(qs) AS BIGINT) AS q_sum,
       list_aggregate(qs, 'min') AS q_min,
       list_aggregate(qs, 'max') AS q_max,
       CAST(len(list_filter(qs, x -> x <> 0)) AS BIGINT) AS n_nonzero
FROM q
"""


def emb_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup CLUSTERS: the LSH-bucketed pair list closed
    into connected components (hook+jump min-label propagation), every
    vector labeled with its cluster's smallest vec_id, a canonical-keep
    flag, and the cluster size -- the embedding-side twin of
    docs_dup_clusters, covering the keep-one-per-cluster policy for
    semantic dedup."""
    from pyspark.sql import Window

    from cassandra_sstable_to_protocolbuf_spark.operators.dedup import (
        connected_components)

    emb = _emb(spark, sf_dir)
    pairs = lsh_dup_pairs(emb, threshold=0.45)
    comp = connected_components(pairs, "id_a", "id_b")
    labeled = (emb.select("vec_id").join(comp, emb.vec_id == comp.node, "left")
               .select(emb.vec_id,
                       F.coalesce("cluster_id", emb.vec_id).alias("cluster_id")))
    return (labeled
            .withColumn("cluster_size",
                        F.count(F.lit(1)).over(Window.partitionBy("cluster_id")))
            .withColumn("is_canonical", F.col("vec_id") == F.col("cluster_id")))


EMB_DUP_CLUSTERS_SQL = f"""
WITH RECURSIVE
pairs AS ({EMB_COSINE_DUP_SQL}),
edges AS (SELECT id_a AS a, id_b AS b FROM pairs
          UNION SELECT id_b, id_a FROM pairs),
reach(node, lbl) AS (
  SELECT a, a FROM edges
  UNION
  SELECT e.a, r.lbl FROM edges e JOIN reach r ON e.b = r.node
),
comp AS (SELECT node, MIN(lbl) AS cluster_id FROM reach GROUP BY node),
labeled AS (
  SELECT v.vec_id, COALESCE(c.cluster_id, v.vec_id) AS cluster_id
  FROM embeddings v LEFT JOIN comp c ON v.vec_id = c.node)
SELECT vec_id, cluster_id,
       CAST(COUNT(*) OVER (PARTITION BY cluster_id) AS BIGINT) AS cluster_size,
       vec_id = cluster_id AS is_canonical
FROM labeled
"""


def emb_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup over the embedding table: coarse-cluster, keep one
    representative per within-cluster semantic neighborhood (cosine >=
    0.45, this corpus's documented near-dup regime). Returns every
    vector with its cluster, keep flag, and shadowing vector -- the
    ledger a semantic-dedup pass hands downstream."""
    from cassandra_sstable_to_protocolbuf_spark.operators.similarity import (
        semdedup)

    return semdedup(_emb(spark, sf_dir), threshold=0.45)


_COS = ("list_sum(list_transform(list_zip({a}, {b}), p -> p[1] * p[2]))"
        " / (sqrt(list_sum(list_transform({a}, x -> x * x)))"
        " * sqrt(list_sum(list_transform({b}, x -> x * x))))")

EMB_SEMDEDUP_SQL = f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
cent AS (SELECT vec_id AS cid, v AS cv FROM e WHERE vec_id % 40 = 7),
assign AS (
  SELECT nid, cid FROM (
    SELECT e.vec_id AS nid, cent.cid,
           ROW_NUMBER() OVER (PARTITION BY e.vec_id
                              ORDER BY {_COS.format(a='e.v', b='cent.cv')}
                                       DESC, cent.cid ASC) AS r
    FROM e CROSS JOIN cent) WHERE r = 1),
pairs AS (
  SELECT a2.nid AS n2, a1.nid AS n1,
         {_COS.format(a='e1.v', b='e2.v')} AS c
  FROM assign a1 JOIN assign a2 ON a1.cid = a2.cid AND a1.nid < a2.nid
  JOIN e e1 ON e1.vec_id = a1.nid
  JOIN e e2 ON e2.vec_id = a2.nid),
shadow AS (
  SELECT n2, max_cos_lower, shadow_id FROM (
    SELECT n2, c AS max_cos_lower, n1 AS shadow_id,
           ROW_NUMBER() OVER (PARTITION BY n2
                              ORDER BY c DESC, n1 ASC) AS r
    FROM pairs) WHERE r = 1)
SELECT a.nid AS vec_id, a.cid,
       COALESCE(s.max_cos_lower, 0.0) AS max_cos_lower,
       COALESCE(s.max_cos_lower, 0.0) < 0.45 AS keep,
       CAST(CASE WHEN COALESCE(s.max_cos_lower, 0.0) >= 0.45
                 THEN s.shadow_id ELSE -1 END AS BIGINT) AS dup_of
FROM assign a LEFT JOIN shadow s ON a.nid = s.n2
"""


def emb_mips_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact max-inner-product top-k (norm-aware retrieval; see
    operators/similarity.py:mips_topk for the norm-augmentation LSH
    reduction that is the 100 TB path)."""
    from cassandra_sstable_to_protocolbuf_spark.operators.similarity import (
        mips_topk)

    emb = _emb(spark, sf_dir)
    queries = (emb.filter(F.col("vec_id") % 25 == 0)
               .select(F.col("vec_id").alias("qid"), "embedding"))
    return mips_topk(emb, queries, k=5)


EMB_MIPS_TOPK_SQL = """
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id % 25 = 0),
scored AS (
  SELECT qid, vec_id AS nid,
         list_sum(list_transform(list_zip(qv, v), p -> p[1] * p[2]))
           AS inner_product
  FROM q, e WHERE vec_id <> qid
)
SELECT qid, rank, nid, inner_product FROM (
  SELECT qid, nid, inner_product,
         ROW_NUMBER() OVER (PARTITION BY qid
                            ORDER BY inner_product DESC, nid ASC) AS rank
  FROM scored
) t WHERE rank <= 5
"""


def emb_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash-gateable distributed k-means (2 Lloyd iterations, fixed-point
    BIGINT -- see operators/ml.py); emits the final per-vector
    assignment with its exact integer squared distance."""
    from cassandra_sstable_to_protocolbuf_spark.operators.ml import (
        kmeans_fixedpoint)

    return kmeans_fixedpoint(_emb(spark, sf_dir), n_iter=2)


def _kmeans_sql() -> str:
    from cassandra_sstable_to_protocolbuf_spark.operators.ml import (
        kmeans_oracle_sql)

    return kmeans_oracle_sql(n_iter=2)


EMB_KMEANS_SQL = _kmeans_sql()


def emb_pq_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization codes + exact reconstruction error (two
    32-dim sub-codebooks from the fixed-point k-means; see
    operators/ml.py:pq_codes)."""
    from cassandra_sstable_to_protocolbuf_spark.operators.ml import pq_codes

    return pq_codes(_emb(spark, sf_dir), n_iter=1)


def _pq_sql() -> str:
    from cassandra_sstable_to_protocolbuf_spark.operators.ml import (
        pq_oracle_sql)

    return pq_oracle_sql(n_iter=1)


EMB_PQ_SQL = _pq_sql()


def emb_matryoshka_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka / truncated-embedding retrieval audit: for each query,
    exact top-5 by FULL 64-dim cosine vs top-5 by the 16-dim PREFIX
    (the MRL deployment question -- how much recall does a 4x cheaper
    prefix index keep?). Emits per query both ranked id lists and the
    integer overlap@5, so the gate hashes rank-order agreement without
    comparing prefix-cosine floats across engines.

    Scale: the decision this audit feeds is exactly the 100 TB lever --
    a prefix index is 4x less memory/bandwidth PER VECTOR; run the
    audit on a sampled slice, then serve at the cheapest dim whose
    overlap clears the product bar. Both rankings share the broadcast
    query-set brute-force shape of emb_cosine_topk (the audited
    baseline, deliberately exact)."""
    emb = _emb(spark, sf_dir)
    queries = (emb.filter(F.col("vec_id") % 25 == 0)
               .select(F.col("vec_id").alias("qid"), "embedding"))
    full = cosine_topk(emb, queries, k=5)
    pemb = emb.select("vec_id", F.slice("embedding", 1, 16).alias("embedding"))
    pq = queries.select("qid", F.slice("embedding", 1, 16).alias("embedding"))
    pre = cosine_topk(pemb, pq, k=5)

    def ranked(df: DataFrame, out: str) -> DataFrame:
        arr = F.transform(
            F.array_sort(F.collect_list(F.struct("rank", "nid"))),
            lambda s: s["nid"].cast("string"))
        return df.groupBy("qid").agg(
            F.array_join(arr, ",").alias(out), arr.alias(f"_{out}"))

    fa = ranked(full, "full_ids")
    pa = ranked(pre, "prefix_ids")
    return (fa.join(pa, "qid")
            .select("qid", "full_ids", "prefix_ids",
                    F.size(F.array_intersect("_full_ids", "_prefix_ids"))
                    .cast("long").alias("overlap5")))


_MAT_SCORED = """
  SELECT qid, vec_id AS nid,
         list_sum(list_transform(list_zip({q}, {v}), p -> p[1] * p[2]))
         / (sqrt(list_sum(list_transform({q}, x -> x * x)))
            * sqrt(list_sum(list_transform({v}, x -> x * x)))) AS cosine
  FROM q, e WHERE vec_id <> qid
"""

EMB_MATRYOSHKA_SQL = f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings),
q AS (SELECT vec_id AS qid, v AS qv FROM e WHERE vec_id % 25 = 0),
ftop AS (SELECT qid, nid, ROW_NUMBER() OVER (PARTITION BY qid
             ORDER BY cosine DESC, nid ASC) AS rank
         FROM ({_MAT_SCORED.format(q="qv", v="v")}) s QUALIFY rank <= 5),
ptop AS (SELECT qid, nid, ROW_NUMBER() OVER (PARTITION BY qid
             ORDER BY cosine DESC, nid ASC) AS rank
         FROM ({_MAT_SCORED.format(q="qv[1:16]", v="v[1:16]")}) s
         QUALIFY rank <= 5),
fa AS (SELECT qid, string_agg(CAST(nid AS VARCHAR), ',' ORDER BY rank)
              AS full_ids FROM ftop GROUP BY qid),
pa AS (SELECT qid, string_agg(CAST(nid AS VARCHAR), ',' ORDER BY rank)
              AS prefix_ids FROM ptop GROUP BY qid),
ov AS (SELECT f.qid, CAST(COUNT(*) AS BIGINT) AS overlap5
       FROM ftop f JOIN ptop p ON f.qid = p.qid AND f.nid = p.nid
       GROUP BY 1)
SELECT qid, full_ids, prefix_ids, COALESCE(ov.overlap5, 0) AS overlap5
FROM fa JOIN pa USING (qid) LEFT JOIN ov USING (qid)
"""


# --- Exact covariance / Gram matrix (whitening prep) ------------------------

EMB_COV_SCALE = 1000  # milli-unit fixed point: |v_fp| ~ 1e3, so a Gram
                      # entry accumulates |1e6| per row -- inside int64
                      # up to ~1e12 rows (micro-units would overflow at
                      # ~1e7 rows for unit-scale embeddings)


def emb_covariance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 64x64 embedding covariance matrix -- the whitening /
    PCA-prep step of an embedding pipeline -- via DISTRIBUTED PARTIAL
    GRAM SUMS: each partition folds its rows into one int64 d x d
    outer-product accumulator with a vectorized numpy matmul
    (mapInPandas, Arrow-batched), then the d^2-row partials hash-merge.
    That is the linear-algebra-at-scale shape: the shuffle carries
    O(partitions x d^2) tiny rows, never O(n), and the per-row work is
    a C-speed rank-k update instead of a 4096-way explode (the oracle
    DOES the double-unnest -- certifying the fast path against the
    naive one). Fixed-point milli-unit values make every Gram entry an
    exact BIGINT; the covariance (n*s_ij - s_i*s_j) / n^2 is the one
    final double, computed identically by both engines."""
    d = 64
    emb = _emb(spark, sf_dir).select("embedding")

    def gram(it):
        import numpy as np
        import pandas as pd

        total = np.zeros((d, d), dtype=np.int64)
        sums = np.zeros(d, dtype=np.int64)
        n = 0
        for pdf in it:
            V = np.stack([np.asarray(a, dtype=np.float64)
                          for a in pdf["embedding"]]) * EMB_COV_SCALE
            # ROUND half-away-from-zero, matching both engines' ROUND
            # (numpy's own round is banker's)
            Vq = np.where(V >= 0, np.floor(V + 0.5),
                          np.ceil(V - 0.5)).astype(np.int64)
            total += Vq.T @ Vq
            sums += Vq.sum(axis=0)
            n += len(Vq)
        if n == 0:
            return
        i, j = np.meshgrid(np.arange(d), np.arange(d), indexing="ij")
        yield pd.DataFrame({
            "i": i.ravel().astype("int32"),
            "j": j.ravel().astype("int32"),
            "s_ij": total.ravel(),
            "s_i": sums[i.ravel()],
            "s_j": sums[j.ravel()],
            "n": np.int64(n)})

    partials = emb.mapInPandas(
        gram, "i int, j int, s_ij long, s_i long, s_j long, n long")
    m = (partials.groupBy("i", "j")
         .agg(F.sum("s_ij").alias("s_ij"), F.sum("s_i").alias("s_i"),
              F.sum("s_j").alias("s_j"), F.sum("n").alias("n")))
    cov = ((F.col("n") * F.col("s_ij") - F.col("s_i") * F.col("s_j"))
           .cast("double")
           / (F.col("n") * F.col("n")).cast("double")
           / (EMB_COV_SCALE * EMB_COV_SCALE))
    return m.select("i", "j", "n", "s_ij", "s_i", "s_j",
                    cov.alias("cov"))


EMB_COVARIANCE_SQL = f"""
WITH q AS (
  SELECT vec_id,
         list_transform(embedding,
                        v -> CAST(ROUND(v * {EMB_COV_SCALE}) AS BIGINT))
           AS vq
  FROM embeddings),
u AS (
  SELECT vec_id, i.i AS i, vq[i.i + 1] AS vi, j.j AS j, vq[j.j + 1] AS vj
  FROM q,
       (SELECT unnest(range(0, 64)) AS i) i,
       (SELECT unnest(range(0, 64)) AS j) j),
m AS (
  SELECT i, j,
         CAST(SUM(vi * vj) AS BIGINT) AS s_ij,
         CAST(SUM(vi) AS BIGINT) AS s_i,
         CAST(SUM(vj) AS BIGINT) AS s_j,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM u GROUP BY 1, 2)
SELECT CAST(i AS INT) AS i, CAST(j AS INT) AS j, n, s_ij, s_i, s_j,
       CAST(n * s_ij - s_i * s_j AS DOUBLE)
       / CAST(n * n AS DOUBLE) / {EMB_COV_SCALE * EMB_COV_SCALE} AS cov
FROM m
"""


def _fixed_point_tokens(emb: DataFrame) -> DataFrame:
    """(vec_id, tq): the 64-dim vector quantized to x10^6 BIGINT fixed
    point (double-promoted BEFORE scaling so Spark's float32 multiply
    cannot disagree with DuckDB's double promotion)."""
    vq = F.expr("transform(embedding, x -> "
                "CAST(ROUND(CAST(x AS DOUBLE) * 1000000) AS BIGINT))")
    return emb.select(F.col("vec_id"), vq.alias("tq"))


def _maxsim_udf():
    """Arrow-batched MaxSim scorer: ONE int64 einsum per batch for the
    4x4 per-pair token dots ([B,4,16]x[B,4,16] contraction). Integer
    matmul has no summation-order sensitivity, so the result is
    bit-identical to a scalar fold (the interpreted zip_with/aggregate
    expression tree measured ~7x slower -- the emb_cosine_all_pairs
    lesson again)."""
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import LongType

    @pandas_udf(LongType())
    def maxsim(qq, tq):
        import numpy as np
        import pandas as pd

        Q = np.stack(qq.to_numpy()).astype(np.int64).reshape(-1, 4, 16)
        T = np.stack(tq.to_numpy()).astype(np.int64).reshape(-1, 4, 16)
        dots = np.einsum("nij,nkj->nik", Q, T)   # [n, q_tok, d_tok]
        return pd.Series(dots.max(axis=2).sum(axis=1))

    return maxsim


def emb_maxsim_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Late-interaction (ColBERT-style) MaxSim retrieval: each vector
    is treated as FOUR 16-dim token embeddings (contiguous slices of
    the 64-dim vector -- the structural stand-in for per-token
    encodings), and a candidate scores
        MaxSim(q, d) = sum_i max_j <q_i, d_j>
    -- every query token matches its best candidate token, summed.
    This is the retrieval scorer single-vector cosine cannot express
    (a doc strong on SOME tokens beats one mediocre on all), and the
    multi-vector index shape modern retrieval stacks (ColBERT, PLAID)
    run at scale.

    Integer-exact: components quantize to x10^6 fixed point (ROUND is
    half-away-from-zero in both engines), dot products and maxes are
    BIGINT (|dot| <= 16 * 1e12, maxsim <= 6.4e13 -- int64 with 5
    decimal orders of headroom), so the gate hashes scores
    bit-for-bit. Top-3 per query, candidate-id tiebreak.

    Scale shape: the exact brute-force baseline over a broadcast
    ~4% query set (one corpus pass, Arrow-vectorized scoring,
    no shuffle) -- the same contract as emb_cosine_topk; the bucketed
    scale path for the single-vector stage is emb_ann_lsh, after which
    MaxSim re-ranks the survivors (re-ranking a bounded candidate set
    is exactly this plan with the corpus side pre-filtered)."""
    from pyspark.sql import Window as W

    toks = _fixed_point_tokens(_emb(spark, sf_dir))
    q = (toks.filter(F.col("vec_id") % 25 == 0)
         .select(F.col("vec_id").alias("qid"), F.col("tq").alias("qq")))

    pairs = (toks.join(F.broadcast(q), F.col("vec_id") != F.col("qid"))
             .select("qid", F.col("vec_id").alias("nid"),
                     _maxsim_udf()("qq", "tq").alias("maxsim")))
    rk = W.partitionBy("qid").orderBy(F.desc("maxsim"), F.asc("nid"))
    return (pairs.withColumn("rank", F.row_number().over(rk).cast("long"))
            .filter(F.col("rank") <= 3)
            .select("qid", "rank", "nid", "maxsim"))


def _maxsim_sql() -> str:
    slices = ", ".join(f"vq[{1 + 16 * i}:{16 * (i + 1)}] AS t{i}"
                       for i in range(4))
    dot = ("CAST(list_sum(list_transform(list_zip({a}, {b}), "
           "p -> p[1] * p[2])) AS BIGINT)")
    best = " + ".join(
        "GREATEST(" + ", ".join(dot.format(a=f"q.qt{i}", b=f"e.t{j}")
                                for j in range(4)) + ")"
        for i in range(4))
    qcols = ", ".join(f"t{i} AS qt{i}" for i in range(4))
    return f"""
WITH f AS (SELECT vec_id,
                  list_transform(embedding,
                                 x -> CAST(ROUND(CAST(x AS DOUBLE) * 1000000)
                                           AS BIGINT))
                    AS vq
           FROM embeddings),
e AS (SELECT vec_id, {slices} FROM f),
q AS (SELECT vec_id AS qid, {qcols} FROM e WHERE vec_id % 25 = 0),
scored AS (SELECT q.qid, e.vec_id AS nid, CAST({best} AS BIGINT) AS maxsim
           FROM q, e WHERE e.vec_id <> q.qid),
ranked AS (SELECT qid, nid, maxsim,
                  CAST(ROW_NUMBER() OVER (PARTITION BY qid
                       ORDER BY maxsim DESC, nid) AS BIGINT) AS rank
           FROM scored)
SELECT qid, rank, nid, maxsim FROM ranked WHERE rank <= 3
"""


EMB_MAXSIM_TOPK_SQL = _maxsim_sql()


def emb_maxsim_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The two-stage retrieval stack COMPOSED: sign-LSH multi-probe
    candidate generation (emb_ann_lsh's stage, shared code --
    lsh_candidate_pairs) feeding late-interaction MaxSim re-ranking
    (emb_maxsim_topk's scorer, shared UDF) over ONLY the bucketed
    candidates. This is the production shape both operators document
    individually -- cheap single-vector recall stage, expensive
    multi-vector precision stage over a bounded set -- run end to end
    and hash-gated: the oracle replays the identical bucketing (literal
    plane matrix + bit flips) and the identical fixed-point MaxSim.

    Scale shape: candidate cost ~n_tables * corpus/2^planes per query
    (never all-pairs); the einsum re-rank touches candidates only. The
    exact-baseline twin emb_maxsim_topk measures what this stage's
    recall gives up (same contract as emb_ann_lsh vs emb_cosine_topk)."""
    from pyspark.sql import Window as W

    from cassandra_sstable_to_protocolbuf_spark.operators.similarity import (
        lsh_candidate_pairs)

    emb = _emb(spark, sf_dir)
    queries = (emb.filter(F.col("vec_id") % 25 == 0)
               .select(F.col("vec_id").alias("qid"), "embedding"))
    pairs, _c, _q = lsh_candidate_pairs(emb, queries, probe_flips=4)
    toks = _fixed_point_tokens(emb)
    scored = (pairs
              .join(toks.select(F.col("vec_id").alias("qid"),
                                F.col("tq").alias("qq")), "qid")
              .join(toks.select(F.col("vec_id").alias("nid"),
                                F.col("tq")), "nid")
              .select("qid", "nid", _maxsim_udf()("qq", "tq").alias("maxsim")))
    rk = W.partitionBy("qid").orderBy(F.desc("maxsim"), F.asc("nid"))
    return (scored.withColumn("rank", F.row_number().over(rk).cast("long"))
            .filter(F.col("rank") <= 3)
            .select("qid", "rank", "nid", "maxsim"))


def _maxsim_rerank_sql() -> str:
    from cassandra_sstable_to_protocolbuf_spark.operators.similarity import (
        lsh_candidates_ctes)

    dot = ("CAST(list_sum(list_transform(list_zip({a}, {b}), "
           "p -> p[1] * p[2])) AS BIGINT)")
    best = " + ".join(
        "GREATEST(" + ", ".join(dot.format(a=f"tq.qt{i}", b=f"tn.t{j}")
                                for j in range(4)) + ")"
        for i in range(4))
    slices = ", ".join(f"vq[{1 + 16 * i}:{16 * (i + 1)}] AS t{i}"
                       for i in range(4))
    qcols = ", ".join(f"t{i} AS qt{i}" for i in range(4))
    return lsh_candidates_ctes("vec_id % 25 = 0", probe_flips=4) + f""",
fx AS (SELECT vec_id,
              list_transform(embedding,
                             x -> CAST(ROUND(CAST(x AS DOUBLE) * 1000000)
                                       AS BIGINT)) AS vq
       FROM embeddings),
et AS (SELECT vec_id, {slices} FROM fx),
qt AS (SELECT vec_id, {qcols} FROM et),
scored AS (SELECT cand.qid, cand.nid, CAST({best} AS BIGINT) AS maxsim
           FROM cand
           JOIN qt tq ON tq.vec_id = cand.qid
           JOIN et tn ON tn.vec_id = cand.nid),
ranked AS (SELECT qid, nid, maxsim,
                  CAST(ROW_NUMBER() OVER (PARTITION BY qid
                       ORDER BY maxsim DESC, nid) AS BIGINT) AS rank
           FROM scored)
SELECT qid, rank, nid, maxsim FROM ranked WHERE rank <= 3
"""


EMB_MAXSIM_RERANK_SQL = _maxsim_rerank_sql()


EMB_PCA_SCALE = 1_000_000  # eigenvector fixed point (x10^6)


def emb_pca_power(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top principal direction by FIXED-POINT POWER ITERATION over the
    exact integer Gram matrix -- the PCA step after emb_covariance's
    whitening prep, kept hash-gateable the same way emb_kmeans is:
    float power iteration could only ever be rows-only.

    One distributed pass builds the exact 64x64 second-moment matrix
    (the same partial-Gram mapInPandas shape as emb_covariance: the
    shuffle carries O(partitions x d^2) rows, never O(n)); then three
    unrolled iterations run as relational algebra over the d^2-row Gram
    table: w = G v is a join + hash SUM, and renormalization divides by
    GREATEST(max|w| DIV 1e6, 1) -- one truncating integer division,
    identical in both engines, keeping the vector at x10^6 scale.
    Bounds: Gram entries <= n * 1e6 (milli^2 units), so w stays inside
    int64 through ~1e11 rows; the oracle recomputes the Gram by the
    naive 4096-way double-unnest AND replays the exact integer
    iterations, so the hash certifies fast Gram == naive Gram AND the
    iteration arithmetic. Sign/direction is deterministic (all-ones
    start). Three iterations certify the MACHINERY; production loops
    until the fixed-point vector stops changing -- each round is the
    same join+agg."""
    d = 64
    emb = _emb(spark, sf_dir).select("embedding")

    def gram(it):
        import numpy as np
        import pandas as pd

        total = np.zeros((d, d), dtype=np.int64)
        seen = 0
        for pdf in it:
            V = np.stack([np.asarray(a, dtype=np.float64)
                          for a in pdf["embedding"]]) * EMB_COV_SCALE
            Vq = np.where(V >= 0, np.floor(V + 0.5),
                          np.ceil(V - 0.5)).astype(np.int64)
            total += Vq.T @ Vq
            seen += len(Vq)
        if seen == 0:
            return
        i, j = np.meshgrid(np.arange(d), np.arange(d), indexing="ij")
        yield pd.DataFrame({"i": i.ravel().astype("int32"),
                            "j": j.ravel().astype("int32"),
                            "g": total.ravel()})

    G = (emb.mapInPandas(gram, "i int, j int, g long")
         .groupBy("i", "j").agg(F.sum("g").alias("g"))
         .localCheckpoint())  # consumed once per iteration: 3 reads
    spark = G.sparkSession
    v = spark.range(d).select(F.col("id").cast("int").alias("j"),
                              F.lit(EMB_PCA_SCALE).cast("long").alias("v"))
    for _ in range(3):
        w = (G.join(v, "j")
             .groupBy("i")
             .agg(F.sum(F.col("g") * F.col("v")).alias("w")))
        mx = w.agg(F.max(F.abs(F.col("w"))).alias("m"))
        v = (w.join(F.broadcast(mx))
             .select(F.col("i").alias("j"),
                     F.expr(f"w DIV GREATEST(m DIV {EMB_PCA_SCALE}, 1)")
                     .cast("long").alias("v")))
    return v.select(F.col("j").alias("dim"), "v")


def _pca_power_sql() -> str:
    steps = []
    prev = "v0"
    for r in (1, 2, 3):
        steps.append(f"""
w{r} AS (SELECT g.i AS j, CAST(SUM(g.g * {prev}.v) AS BIGINT) AS w
         FROM g JOIN {prev} ON g.j = {prev}.j GROUP BY 1),
m{r} AS (SELECT CAST(MAX(ABS(w)) AS BIGINT) AS m FROM w{r}),
v{r} AS (SELECT j, CAST(w // GREATEST(m // {EMB_PCA_SCALE}, 1) AS BIGINT)
                AS v
         FROM w{r}, m{r})""")
        prev = f"v{r}"
    return f"""
WITH q AS (SELECT vec_id,
                  list_transform(embedding,
                                 v -> CAST(ROUND(v * {EMB_COV_SCALE}) AS BIGINT))
                    AS vq
           FROM embeddings),
u AS (SELECT i.i AS i, vq[i.i + 1] AS vi, j.j AS j, vq[j.j + 1] AS vj
      FROM q,
           (SELECT unnest(range(0, 64)) AS i) i,
           (SELECT unnest(range(0, 64)) AS j) j),
g AS (SELECT i, j, CAST(SUM(vi * vj) AS BIGINT) AS g FROM u GROUP BY 1, 2),
v0 AS (SELECT CAST(unnest(range(0, 64)) AS INT) AS j,
              CAST({EMB_PCA_SCALE} AS BIGINT) AS v),{",".join(steps)}
SELECT CAST(j AS INT) AS dim, v FROM v3
"""


EMB_PCA_POWER_SQL = _pca_power_sql()
