"""Similarity search over embedding columns (array<float>).

* cosine_topk -- brute-force exact top-k: broadcast the (small) query
  set, one narrow pass over the corpus, per-query top-k via window.
  All arithmetic is a JVM-side left fold (F.aggregate / F.zip_with) in
  double precision -- no Python in the loop, bit-identical to a
  sequential sum.
* ann_lsh_topk -- random-hyperplane (sign) LSH bucketing: only corpus
  vectors sharing a signature bucket with the query are scored. The
  100 TB scale path: candidate generation is an equi-join on (table,
  signature), so cost is ~n_tables * corpus/2^bits per query instead of
  full corpus. Approximate recall (a true neighbor can land in another
  bucket; multiple hash tables raise it) but DETERMINISTIC at fixed
  seed, with an exact DuckDB oracle.
* lsh_dup_pairs -- the same signatures applied to all-pairs dedup:
  bucket-mate candidate pairs + exact cosine verify.

At cluster scale the brute-force variant is still the right baseline when
the query set is small (broadcast) -- it is one scan, embarrassingly
parallel, no shuffle. The LSH variant trades recall for sublinear probe
cost when queries are many.
"""

from __future__ import annotations

import random

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast
from pyspark.sql.types import ArrayType, LongType
from cassandra_sstable_to_protocolbuf_spark.session import pin


def cosine_topk(corpus: DataFrame, queries: DataFrame, k: int = 5,
                id_col: str = "vec_id", vec_col: str = "embedding",
                query_id_col: str = "qid") -> DataFrame:
    """Exact cosine top-k: for each query vector, the k nearest corpus
    vectors (self excluded), rank-ordered with id tiebreak."""
    from cassandra_sstable_to_protocolbuf_spark.session import widen

    c = widen(corpus).select(F.col(id_col).alias("nid"), F.col(vec_col).alias("v"))
    q = queries.select(F.col(query_id_col).alias("qid"), F.col(vec_col).alias("qv"))
    cos = cosine_verify_udf()
    scored = (
        broadcast(q).crossJoin(c)
        .filter(F.col("nid") != F.col("qid"))
        .select("qid", "nid", cos("qv", "v").alias("cosine"))
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("nid"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("qid", "rank", "nid", "cosine"))


def rademacher_planes(seed: int, n_planes: int, dim: int = 64) -> list[list[float]]:
    """Deterministic +-1 hyperplanes (Achlioptas-style random projection).

    Sign-LSH needs only the SIGN of v . r, for which Rademacher entries are
    as good as gaussians (same collision-probability geometry) while being
    exactly representable as SQL literals -- the DuckDB oracle embeds the
    identical matrix, so both engines compute bit-identical signatures.
    """
    rng = random.Random(seed)
    return [[rng.choice((1.0, -1.0)) for _ in range(dim)]
            for _ in range(n_planes)]


def lsh_signature_udf(n_tables: int, n_planes: int, seed: int, dim: int = 64,
                      multiprobe: bool = False):
    """Arrow-batched signature computer: vec -> array of n_tables packed
    sign-bit signatures (n_planes bits each).

    With multiprobe=True the output interleaves, per table, the true
    signature and ONE probe signature with the lowest-|margin| bit
    flipped (classic multi-probe LSH: the plane whose projection is
    closest to zero is the likeliest sign error, so probing its flip
    recovers most hamming-1 near-misses). Output length doubles to
    2*n_tables: [sig_0, probe_0, sig_1, probe_1, ...]. Margin argmin
    takes the FIRST minimal index, matching the oracle's CASE chain.

    The projection is accumulated dimension-by-dimension (a left fold in
    dim order, vectorized ACROSS rows with numpy), so each double add
    happens in exactly the order DuckDB's list_sum and Spark's F.aggregate
    use -- signatures are bit-identical across engines, which is what lets
    a bucketed (approximate) operator have an exact SQL oracle.

    This is the sanctioned Pandas-UDF escape hatch: 192 plane-dots per row
    through interpreted higher-order functions would cost ~8k lambda evals
    per row; one numpy matmul-shaped loop is ~100x cheaper and stays
    Arrow-batched (no per-row Python).
    """
    from pyspark.sql.functions import pandas_udf

    planes = np.array(rademacher_planes(seed, n_tables * n_planes, dim))
    weights = (1 << np.arange(n_planes)).astype(np.int64)

    @pandas_udf(ArrayType(LongType()))
    def sigs(vecs: pd.Series) -> pd.Series:
        m = np.stack(vecs.to_numpy()).astype(np.float64)
        acc = np.zeros((m.shape[0], planes.shape[0]))
        for i in range(dim):  # dim-ordered left fold, rows vectorized
            acc += m[:, i:i + 1] * planes[:, i]
        bits = acc > 0
        packed = np.stack(
            [bits[:, t * n_planes:(t + 1) * n_planes] @ weights
             for t in range(n_tables)], axis=1)
        if not multiprobe:
            return pd.Series(list(packed))
        jmin = np.abs(acc).reshape(m.shape[0], n_tables, n_planes) \
            .argmin(axis=2)
        probe = packed ^ (np.int64(1) << jmin)
        out = np.empty((m.shape[0], 2 * n_tables), dtype=np.int64)
        out[:, 0::2] = packed
        out[:, 1::2] = probe
        return pd.Series(list(out))

    return sigs


def cosine_verify_udf():
    """Arrow-batched exact cosine between two vector columns.

    Same sanctioned escape hatch as lsh_signature_udf: the dot/norm
    accumulators run dimension-by-dimension (vectorized ACROSS rows), so
    every double add and the final sqrt/divide happen in exactly the
    order of the interpreted F.aggregate fold and DuckDB's list_sum --
    bit-identical cosines, ~10x cheaper than 64 interpreted lambda evals
    per candidate pair.
    """
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import DoubleType

    @pandas_udf(DoubleType())
    def cos(va: pd.Series, vb: pd.Series) -> pd.Series:
        a = np.stack(va.to_numpy()).astype(np.float64)
        b = np.stack(vb.to_numpy()).astype(np.float64)
        dot = np.zeros(a.shape[0])
        na = np.zeros(a.shape[0])
        nb = np.zeros(a.shape[0])
        for i in range(a.shape[1]):  # dim-ordered left folds, rows vectorized
            dot += a[:, i] * b[:, i]
            na += a[:, i] * a[:, i]
            nb += b[:, i] * b[:, i]
        return pd.Series(dot / (np.sqrt(na) * np.sqrt(nb)))

    return cos


def lsh_dup_pairs(corpus: DataFrame, threshold: float = 0.45,
                  n_tables: int = 24, n_planes: int = 8, seed: int = 7,
                  max_bucket: int = 1000, dim: int = 64,
                  id_col: str = "vec_id",
                  vec_col: str = "embedding",
                  multiprobe: bool = True) -> DataFrame:
    """Near-duplicate pairs via RP-LSH bucketing + exact cosine verify.

    The 100 TB-safe formulation of embedding dedup: candidate pairs come
    from an EQUI-join on (table, signature) -- cost ~ sum of bucket^2, not
    corpus^2 -- then only candidates pay the exact 64-dim cosine.
    Completely deterministic given `seed`, so it is oracle-checkable: the
    result is exactly {pairs sharing >=1 un-capped bucket, cosine >=
    threshold}. Recall vs the exact all-pairs twin is a measured property
    (see tests/test_approx_quality.py); precision is 1.0 by construction
    (the verify step is exact).

    multiprobe=True (default) registers, per table, one extra probe
    signature with the lowest-|margin| bit flipped; bucket membership is
    the probe-set, so pairs whose true signatures differ by up to two
    low-margin bits still collide. On the corpus's hard weak-threshold
    regime (true pairs ~63 deg vs ~90 deg background) this lifts recall
    from ~0.55 to ~0.9 for ~2x candidate cost -- still linear, still
    deterministic, still exactly mirrored by the oracle.

    Skew guard: buckets with more than `max_bucket` members are dropped
    from candidate generation (the degenerate-bucket quadratic blowup --
    e.g. all-zero embeddings -- the same hot-key cap as the shingle
    inverted index). Deterministic, mirrored by the oracle.
    """
    from cassandra_sstable_to_protocolbuf_spark.session import widen

    sig_udf = lsh_signature_udf(n_tables, n_planes, seed, dim,
                                multiprobe=multiprobe)
    e = widen(corpus).select(F.col(id_col).alias("id"),
                             F.col(vec_col).alias("emb"))
    # cache: the exploded signatures feed BOTH self-join sides and the
    # bucket-stats agg, and AQE's broadcast defeats ReusedExchange --
    # without it the Arrow signature UDF runs three times. n_tables rows
    # per vector (2x with probes), two longs each: tiny even at corpus
    # scale.
    ex = e.select("id", F.posexplode(sig_udf("emb")).alias("t", "sig"))
    if multiprobe:  # interleaved [sig_t, probe_t]: position -> table id
        ex = ex.withColumn("t", F.floor(F.col("t") / 2).cast("int"))
    ex = pin(ex)
    # bounded small: <= n_tables * 2^n_planes distinct buckets => broadcast
    ok_buckets = (ex.groupBy("t", "sig")
                  .agg(F.count(F.lit(1)).alias("n_members"))
                  .filter(F.col("n_members") <= max_bucket)
                  .select("t", "sig"))
    member = ex.join(broadcast(ok_buckets), ["t", "sig"])
    a = member.select("t", "sig", F.col("id").alias("id_a"))
    b = member.select("t", "sig", F.col("id").alias("id_b"))
    pairs = (a.join(b, ["t", "sig"])
             .filter(F.col("id_a") < F.col("id_b"))
             .select("id_a", "id_b")
             .dropDuplicates(["id_a", "id_b"]))
    va = e.select(F.col("id").alias("id_a"), F.col("emb").alias("va"))
    vb = e.select(F.col("id").alias("id_b"), F.col("emb").alias("vb"))
    cos = cosine_verify_udf()
    return (pairs.join(va, "id_a").join(vb, "id_b")
            .select("id_a", "id_b", cos("va", "vb").alias("cosine"))
            .filter(F.col("cosine") >= F.lit(threshold)))


def lsh_dup_pairs_oracle_sql(threshold: float = 0.45, n_tables: int = 24,
                             n_planes: int = 8, seed: int = 7,
                             max_bucket: int = 1000, dim: int = 64,
                             table: str = "embeddings",
                             multiprobe: bool = True) -> str:
    """DuckDB oracle for lsh_dup_pairs: the identical +-1 plane matrix is
    embedded as literals; list_sum's left fold matches the UDF's
    dim-ordered accumulation bit-for-bit, so bucket membership -- not just
    the verified cosine -- is reproduced exactly. With multiprobe, each
    per-table block also emits the probe row: the signature with the
    lowest-|margin| bit flipped, the argmin realized as a first-match
    CASE chain over the per-plane dots (same first-minimal-index rule as
    numpy argmin)."""
    planes = rademacher_planes(seed, n_tables * n_planes, dim)

    def dot(plane: list[float]) -> str:
        lits = ",".join("1.0" if w > 0 else "-1.0" for w in plane)
        return ("list_sum(list_transform(list_zip(v, [" + lits +
                "]), p -> p[1] * p[2]))")

    selects = []
    for t in range(n_tables):
        # inner projection computes each plane dot ONCE; the outer level
        # assembles signature bits (and the probe flip) from d0..dN
        dots = ", ".join(
            f"{dot(planes[t * n_planes + j])} AS d{j}"
            for j in range(n_planes))
        bits = " + ".join(
            f"(CASE WHEN d{j} > 0 THEN {1 << j} ELSE 0 END)"
            for j in range(n_planes))
        inner = f"SELECT vec_id, {dots} FROM e"
        selects.append(
            f"SELECT vec_id, {t} AS t, CAST({bits} AS BIGINT) AS sig "
            f"FROM ({inner})")
        if multiprobe:
            argmin = "CASE " + " ".join(
                "WHEN " + " AND ".join(
                    f"abs(d{j}) <= abs(d{l})"
                    for l in range(n_planes) if l != j)
                + f" THEN {j}"
                for j in range(n_planes - 1)) + f" ELSE {n_planes - 1} END"
            selects.append(
                f"SELECT vec_id, {t} AS t, "
                f"CAST(xor(CAST({bits} AS BIGINT), "
                f"CAST(1 << ({argmin}) AS BIGINT)) AS BIGINT) AS sig "
                f"FROM ({inner})")
    sigt = "\nUNION ALL\n".join(selects)
    return f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM {table}),
sigt AS ({sigt}),
ok AS (SELECT t, sig FROM sigt GROUP BY t, sig HAVING COUNT(*) <= {max_bucket}),
member AS (SELECT s.vec_id, s.t, s.sig FROM sigt s JOIN ok USING (t, sig)),
cand AS (
  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
  FROM member a JOIN member b
    ON a.t = b.t AND a.sig = b.sig AND a.vec_id < b.vec_id
)
SELECT id_a, id_b, cosine FROM (
  SELECT id_a, id_b,
         list_sum(list_transform(list_zip(ea.v, eb.v), p -> p[1] * p[2]))
         / (sqrt(list_sum(list_transform(ea.v, x -> x * x)))
            * sqrt(list_sum(list_transform(eb.v, x -> x * x)))) AS cosine
  FROM cand
  JOIN e ea ON ea.vec_id = cand.id_a
  JOIN e eb ON eb.vec_id = cand.id_b
) WHERE cosine >= {threshold}
"""


def lsh_candidate_pairs(corpus: DataFrame, queries: DataFrame,
                        id_col: str = "vec_id", vec_col: str = "embedding",
                        query_id_col: str = "qid", n_planes: int = 4,
                        n_tables: int = 6, seed: int = 42,
                        dim: int = 64, probe_flips: int = 0):
    """The candidate-generation stage shared by ann_lsh_topk and the
    late-interaction re-ranker: sign-LSH bucketing (OR over n_tables
    tables, optional Hamming-1 multi-probe on the query side), one
    equi-join on (table, signature), deduped. Returns (pairs[qid, nid],
    corpus[nid, emb], queries[qid, emb]) so the caller picks its
    scoring function over the BOUNDED candidate set."""
    from cassandra_sstable_to_protocolbuf_spark.session import widen

    sig_udf = lsh_signature_udf(n_tables, n_planes, seed, dim)
    c = widen(corpus).select(F.col(id_col).alias("nid"),
                             F.col(vec_col).alias("emb"))
    q = queries.select(F.col(query_id_col).alias("qid"),
                       F.col(vec_col).alias("emb"))
    c_ex = c.select("nid", F.posexplode(sig_udf("emb")).alias("t", "sig"))
    q_ex = q.select("qid", F.posexplode(sig_udf("emb")).alias("t", "sig"))
    if probe_flips:
        probes = [F.col("sig")] + [
            F.col("sig").bitwiseXOR(F.lit(1 << j))
            for j in range(probe_flips)]
        q_ex = q_ex.select(
            "qid", "t", F.explode(F.array(*probes)).alias("sig"))
    # no broadcast hints: the query side here is a corpus fraction, not
    # a bounded dim -- AQE broadcasts it at small SF and shuffles at
    # scale (a hardcoded hint would OOM on a large query set)
    pairs = (q_ex.join(c_ex, ["t", "sig"])
             .filter(F.col("nid") != F.col("qid"))
             .select("qid", "nid")
             .dropDuplicates(["qid", "nid"]))
    return pairs, c, q


def ann_lsh_topk(corpus: DataFrame, queries: DataFrame, k: int = 5,
                 id_col: str = "vec_id", vec_col: str = "embedding",
                 query_id_col: str = "qid", n_planes: int = 4,
                 n_tables: int = 6, seed: int = 42,
                 dim: int = 64, probe_flips: int = 0) -> DataFrame:
    """Approximate cosine top-k: score only bucket-mates of each query.

    OR-construction over `n_tables` independent sign-LSH tables (one
    posexplode + equi-join on (table, signature), deduped): one table
    leaves some queries with empty or tiny buckets; multiple tables make
    a candidate-free query exponentially unlikely while keeping probe
    cost ~n_tables * corpus/2^n_planes per query. Shares the Rademacher
    signature machinery with lsh_dup_pairs, so the result is fully
    deterministic and has an exact DuckDB oracle
    (ann_lsh_topk_oracle_sql).

    probe_flips=j additionally probes, per table, the j buckets at
    Hamming distance 1 from the query's bucket (bits 0..j-1 flipped) --
    multi-probe: near-boundary neighbors land one bit away far more
    often than chance, so recall rises steeply for a (j+1)x probe-cost
    factor, without adding tables (which would multiply CORPUS-side
    signature cost, not just query-side probes)."""
    pairs, c, q = lsh_candidate_pairs(
        corpus, queries, id_col=id_col, vec_col=vec_col,
        query_id_col=query_id_col, n_planes=n_planes, n_tables=n_tables,
        seed=seed, dim=dim, probe_flips=probe_flips)
    cv = c.select(F.col("nid"), F.col("emb").alias("v"))
    qv = q.select(F.col("qid"), F.col("emb").alias("qv"))
    cos = cosine_verify_udf()
    scored = (pairs.join(qv, "qid").join(cv, "nid")
              .select("qid", "nid", cos("qv", "v").alias("cosine")))
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("nid"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("qid", "rank", "nid", "cosine"))


def ivf_topk(corpus: DataFrame, queries: DataFrame, k: int = 5,
             nprobe: int = 2, centroid_mod: int = 40, centroid_rem: int = 7,
             id_col: str = "vec_id", vec_col: str = "embedding",
             query_id_col: str = "qid") -> DataFrame:
    """IVF-style approximate top-k: coarse-quantize the corpus into
    centroid cells, probe only the query's `nprobe` nearest cells.

    Centroids are a deterministic corpus subset (vec_id % centroid_mod
    == centroid_rem -- K ~ N/centroid_mod plays the sqrt(N)-codebook
    role; a trained k-means codebook drops in by swapping the centroid
    DataFrame). Cell assignment is a map-side max_by aggregation over
    the broadcast centroid set (no N x K shuffle), so the partition
    phase is one corpus pass; the probe phase touches ~nprobe/K of the
    corpus per query. Fully deterministic: cosine scores are bit-exact
    across engines, ties break toward the lower centroid id, so the
    DuckDB oracle (ivf_topk_oracle_sql) reproduces the cells exactly.
    """
    from cassandra_sstable_to_protocolbuf_spark.session import widen

    cos = cosine_verify_udf()
    cent = (corpus.filter((F.col(id_col) % centroid_mod) == centroid_rem)
            .select(F.col(id_col).alias("cid"), F.col(vec_col).alias("cv")))
    v = widen(corpus).select(F.col(id_col).alias("nid"),
                             F.col(vec_col).alias("v"))
    # argmax centroid per vector: max_by over (cos, -cid) aggregates
    # with map-side combine instead of shuffling all N x K pairs
    assign = (v.crossJoin(broadcast(cent))
              .select("nid", "cid", cos("v", "cv").alias("cos"))
              .groupBy("nid")
              .agg(F.max_by("cid", F.struct(F.col("cos"),
                                            (-F.col("cid")).alias("neg")))
                   .alias("cid")))
    q = queries.select(F.col(query_id_col).alias("qid"),
                       F.col(vec_col).alias("qv"))
    wprobe = Window.partitionBy("qid").orderBy(F.desc("cos"), F.asc("cid"))
    probes = (q.crossJoin(broadcast(cent))
              .select("qid", "cid", cos("qv", "cv").alias("cos"))
              .withColumn("r", F.row_number().over(wprobe))
              .filter(F.col("r") <= nprobe)
              .select("qid", "cid"))
    cand = (probes.join(assign, "cid")
            .filter(F.col("nid") != F.col("qid"))
            .select("qid", "nid").dropDuplicates(["qid", "nid"]))
    scored = (cand.join(q, "qid").join(v, "nid")
              .select("qid", "nid", cos("qv", "v").alias("cosine")))
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("nid"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("qid", "rank", "nid", "cosine"))


def ivf_topk_oracle_sql(query_pred: str, k: int = 5, nprobe: int = 2,
                        centroid_mod: int = 40, centroid_rem: int = 7,
                        table: str = "embeddings") -> str:
    """DuckDB oracle for ivf_topk: identical centroid subset, identical
    bit-exact cosine cell assignment (window-argmax with the same
    tiebreak), identical probe and rescoring."""
    cos = ("list_sum(list_transform(list_zip({a}, {b}), p -> p[1] * p[2]))"
           " / (sqrt(list_sum(list_transform({a}, x -> x * x)))"
           " * sqrt(list_sum(list_transform({b}, x -> x * x))))")
    return f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM {table}),
cent AS (SELECT vec_id AS cid, v AS cv FROM e
         WHERE vec_id % {centroid_mod} = {centroid_rem}),
assign AS (
  SELECT nid, cid FROM (
    SELECT e.vec_id AS nid, cent.cid,
           ROW_NUMBER() OVER (PARTITION BY e.vec_id
                              ORDER BY {cos.format(a='e.v', b='cent.cv')} DESC,
                                       cent.cid ASC) AS r
    FROM e CROSS JOIN cent
  ) WHERE r = 1
),
probes AS (
  SELECT qid, cid FROM (
    SELECT q.vec_id AS qid, cent.cid,
           ROW_NUMBER() OVER (PARTITION BY q.vec_id
                              ORDER BY {cos.format(a='q.v', b='cent.cv')} DESC,
                                       cent.cid ASC) AS r
    FROM e q CROSS JOIN cent WHERE {query_pred.replace('vec_id', 'q.vec_id')}
  ) WHERE r <= {nprobe}
),
cand AS (
  SELECT DISTINCT probes.qid, assign.nid
  FROM probes JOIN assign USING (cid)
  WHERE assign.nid <> probes.qid
)
SELECT qid, rank, nid, cosine FROM (
  SELECT cand.qid, cand.nid,
         {cos.format(a='eq.v', b='en.v')} AS cosine,
         ROW_NUMBER() OVER (PARTITION BY cand.qid
                            ORDER BY {cos.format(a='eq.v', b='en.v')} DESC,
                                     cand.nid ASC) AS rank
  FROM cand
  JOIN e eq ON eq.vec_id = cand.qid
  JOIN e en ON en.vec_id = cand.nid
) t WHERE rank <= {k}
"""


def lsh_candidates_ctes(query_pred: str, n_planes: int = 4,
                        n_tables: int = 6, seed: int = 42,
                        dim: int = 64, probe_flips: int = 0,
                        table: str = "embeddings") -> str:
    """The candidate-generation CTE chain (through `cand(qid, nid)`)
    shared by the ann_lsh_topk oracle and the MaxSim re-rank oracle:
    identical literal plane matrix, identical fold order, identical
    multi-probe bit flips."""
    planes = rademacher_planes(seed, n_tables * n_planes, dim)
    flip_vals = ", ".join(
        f"({v})" for v in [0] + [1 << j for j in range(probe_flips)])
    qsig_expand = (
        f", qsig AS (SELECT qid, t, xor(sig, CAST(f AS BIGINT)) AS sig\n"
        f"            FROM qsig0, (VALUES {flip_vals}) flips(f))"
        if probe_flips else
        ", qsig AS (SELECT qid, t, sig FROM qsig0)")

    def dot(plane: list[float]) -> str:
        lits = ",".join("1.0" if w > 0 else "-1.0" for w in plane)
        return ("list_sum(list_transform(list_zip(v, [" + lits +
                "]), p -> p[1] * p[2]))")

    selects = []
    for t in range(n_tables):
        bits = " + ".join(
            f"(CASE WHEN {dot(planes[t * n_planes + j])} > 0 "
            f"THEN {1 << j} ELSE 0 END)"
            for j in range(n_planes))
        selects.append(
            f"SELECT vec_id, {t} AS t, CAST({bits} AS BIGINT) AS sig FROM e")
    sigt = "\nUNION ALL\n".join(selects)
    return f"""
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM {table}),
sigt AS ({sigt}),
qsig0 AS (SELECT vec_id AS qid, t, sig FROM sigt WHERE {query_pred})
{qsig_expand},
cand AS (
  SELECT DISTINCT q.qid, s.vec_id AS nid
  FROM qsig q JOIN sigt s USING (t, sig)
  WHERE s.vec_id <> q.qid
)"""


def ann_lsh_topk_oracle_sql(query_pred: str, k: int = 5, n_planes: int = 4,
                            n_tables: int = 6, seed: int = 42,
                            dim: int = 64, probe_flips: int = 0,
                            table: str = "embeddings") -> str:
    """DuckDB oracle for ann_lsh_topk: identical literal plane matrix,
    identical fold order (and the identical multi-probe bit flips),
    window top-k over the bucketed candidates. `query_pred` selects the
    query subset (e.g. 'vec_id % 25 = 0')."""
    return lsh_candidates_ctes(query_pred, n_planes, n_tables, seed, dim,
                               probe_flips, table) + f""",
scored AS (
  SELECT qid, nid,
         list_sum(list_transform(list_zip(eq.v, en.v), p -> p[1] * p[2]))
         / (sqrt(list_sum(list_transform(eq.v, x -> x * x)))
            * sqrt(list_sum(list_transform(en.v, x -> x * x)))) AS cosine
  FROM cand
  JOIN e eq ON eq.vec_id = cand.qid
  JOIN e en ON en.vec_id = cand.nid
)
SELECT qid, rank, nid, cosine FROM (
  SELECT qid, nid, cosine,
         ROW_NUMBER() OVER (PARTITION BY qid
                            ORDER BY cosine DESC, nid ASC) AS rank
  FROM scored
) t WHERE rank <= {k}
"""


def semdedup(corpus: DataFrame, threshold: float = 0.45,
             centroid_mod: int = 40, centroid_rem: int = 7,
             id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Semantic dedup (SemDeDup, Abbas et al. 2023 shape): coarse-cluster
    the embedding space, then WITHIN each cluster drop every vector whose
    cosine to a lower-id cluster-mate reaches the threshold -- keeping
    one representative per semantic neighborhood without ever comparing
    across clusters. Emits one row per vector: cluster id, the max
    cosine to any lower-id cluster-mate, the keep flag, and (for drops)
    which vector shadowed it.

    Same deterministic coarse quantizer as ivf_topk (seeded corpus
    subset as centroids; a trained k-means codebook drops in by swapping
    the centroid frame). Scale shape: one broadcast-centroid assignment
    pass (map-side argmax, no N x K shuffle), then a SELF-JOIN KEYED ON
    CLUSTER ID -- cost is sum of cell^2, bounded by the quantizer's cell
    sizes, never corpus^2; the known recall tradeoff is that near-dups
    split across a cluster boundary are not compared (the paper's own
    design point)."""
    from cassandra_sstable_to_protocolbuf_spark.session import widen

    cos = cosine_verify_udf()
    cent = (corpus.filter((F.col(id_col) % centroid_mod) == centroid_rem)
            .select(F.col(id_col).alias("cid"), F.col(vec_col).alias("cv")))
    v = widen(corpus).select(F.col(id_col).alias("nid"),
                             F.col(vec_col).alias("v"))
    assign = (v.crossJoin(broadcast(cent))
              .select("nid", "cid", cos("v", "cv").alias("cos"))
              .groupBy("nid")
              .agg(F.max_by("cid", F.struct(F.col("cos"),
                                            (-F.col("cid")).alias("neg")))
                   .alias("cid")))
    a1 = (assign.select(F.col("nid").alias("n1"), "cid")
          .join(v.select(F.col("nid").alias("n1"), F.col("v").alias("v1")),
                "n1"))
    a2 = (assign.select(F.col("nid").alias("n2"), "cid")
          .join(v.select(F.col("nid").alias("n2"), F.col("v").alias("v2")),
                "n2"))
    shadow = (a1.join(a2, ["cid"])
              .filter(F.col("n1") < F.col("n2"))
              .select("n2", "n1", cos("v1", "v2").alias("c"))
              .groupBy("n2")
              .agg(F.max("c").alias("max_cos_lower"),
                   F.max_by("n1", F.struct(F.col("c"),
                                           (-F.col("n1")).alias("neg")))
                   .alias("shadow_id")))
    return (assign.join(shadow, assign.nid == shadow.n2, "left")
            .select(F.col("nid").alias(id_col), "cid",
                    F.coalesce("max_cos_lower", F.lit(0.0))
                    .alias("max_cos_lower"),
                    (F.coalesce("max_cos_lower", F.lit(0.0))
                     < F.lit(threshold)).alias("keep"),
                    F.when(F.coalesce("max_cos_lower", F.lit(0.0))
                           >= F.lit(threshold), F.col("shadow_id"))
                    .otherwise(F.lit(-1)).cast("long").alias("dup_of")))


def dot_verify_udf():
    """Arrow-batched exact INNER PRODUCT between two vector columns --
    cosine_verify_udf without the norms, same dim-ordered left fold so
    the double matches DuckDB's list_sum(list_transform(list_zip))
    bit-for-bit."""
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import DoubleType

    @pandas_udf(DoubleType())
    def dot(va: pd.Series, vb: pd.Series) -> pd.Series:
        a = np.stack(va.to_numpy()).astype(np.float64)
        b = np.stack(vb.to_numpy()).astype(np.float64)
        acc = np.zeros(a.shape[0])
        for i in range(a.shape[1]):  # dim-ordered left fold, rows vectorized
            acc += a[:, i] * b[:, i]
        return pd.Series(acc)

    return dot


def mips_topk(corpus: DataFrame, queries: DataFrame, k: int = 5,
              id_col: str = "vec_id", vec_col: str = "embedding",
              query_id_col: str = "qid") -> DataFrame:
    """Exact maximum-inner-product top-k (the retrieval metric of
    recommendation / dense-retrieval scorers, where vector NORM carries
    signal cosine throws away). Brute-force baseline over a broadcast
    query set, like cosine_topk. The 100 TB path is the standard
    norm-augmentation reduction (Bachrach et al. 2014): append
    sqrt(M^2 - |x|^2) to every corpus vector and 0 to queries -- inner
    product order becomes cosine order, so ann_lsh_topk's bucketed
    sign-LSH applies unchanged; this exact form is the gate baseline."""
    from cassandra_sstable_to_protocolbuf_spark.session import widen

    c = widen(corpus).select(F.col(id_col).alias("nid"),
                             F.col(vec_col).alias("v"))
    q = queries.select(F.col(query_id_col).alias("qid"),
                       F.col(vec_col).alias("qv"))
    dot = dot_verify_udf()
    scored = (broadcast(q).crossJoin(c)
              .filter(F.col("nid") != F.col("qid"))
              .select("qid", "nid", dot("qv", "v").alias("inner_product")))
    w = Window.partitionBy("qid").orderBy(F.desc("inner_product"),
                                          F.asc("nid"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("qid", "rank", "nid", "inner_product"))
