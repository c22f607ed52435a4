"""Similarity search over embedding columns (array<float>).

* cosine_topk -- brute-force exact top-k: broadcast the (small) query
  set, one narrow pass over the corpus, per-query top-k via window.
  All arithmetic is a JVM-side left fold (F.aggregate / F.zip_with) in
  double precision -- no Python in the loop, bit-identical to a
  sequential sum.
* rp_lsh_topk -- random-hyperplane LSH bucketing: only corpus vectors
  sharing a signature bucket with the query are scored. The 100 TB scale
  path: candidate generation is an equi-join on the signature, so cost is
  ~corpus/2^bits per query instead of full corpus. Approximate (a true
  neighbor can land in another bucket; multiple hash tables raise recall).

At cluster scale the brute-force variant is still the right baseline when
the query set is small (broadcast) -- it is one scan, embarrassingly
parallel, no shuffle. The LSH variant trades recall for sublinear probe
cost when queries are many.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast


def _as_double(col: str):
    return F.transform(col, lambda x: x.cast("double"))


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y),
                       F.lit(0.0), lambda acc, x: acc + x)


def _norm(a):
    return F.sqrt(F.aggregate(F.transform(a, lambda x: x * x),
                              F.lit(0.0), lambda acc, x: acc + x))


def cosine_topk(corpus: DataFrame, queries: DataFrame, k: int = 5,
                id_col: str = "vec_id", vec_col: str = "embedding",
                query_id_col: str = "qid") -> DataFrame:
    """Exact cosine top-k: for each query vector, the k nearest corpus
    vectors (self excluded), rank-ordered with id tiebreak."""
    from cassandra_sstable_to_protocolbuf_spark.session import widen

    c = widen(corpus).select(F.col(id_col).alias("nid"), _as_double(vec_col).alias("v"))
    q = queries.select(F.col(query_id_col).alias("qid"), _as_double(vec_col).alias("qv"))
    cos = _dot(F.col("qv"), F.col("v")) / (_norm(F.col("qv")) * _norm(F.col("v")))
    scored = (
        broadcast(q).crossJoin(c)
        .filter(F.col("nid") != F.col("qid"))
        .select("qid", "nid", cos.alias("cosine"))
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("nid"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("qid", "rank", "nid", "cosine"))


def rp_lsh_signatures(df: DataFrame, vec_col: str, id_col: str,
                      n_planes: int = 8, seed: int = 42, dim: int = 64) -> DataFrame:
    """Random-hyperplane signature: bit i = sign(v . r_i).

    Hyperplanes are a deterministic pseudo-random matrix generated from
    `seed` driver-side (tiny: n_planes x dim) and embedded as a literal
    array -- broadcast-free and identical on every executor.
    """
    import random

    rng = random.Random(seed)
    planes = [[rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(n_planes)]
    v = _as_double(vec_col)
    sig = F.lit(0).cast("long")
    for i, plane in enumerate(planes):
        proj = _dot(v, F.array(*[F.lit(x) for x in plane]))
        sig = sig + F.when(proj > 0, F.lit(1 << i).cast("long")).otherwise(F.lit(0).cast("long"))
    return df.select(F.col(id_col).alias("id"), v.alias("v"), sig.alias("sig"))


def rp_lsh_topk(corpus: DataFrame, queries: DataFrame, k: int = 5,
                id_col: str = "vec_id", vec_col: str = "embedding",
                query_id_col: str = "qid", n_planes: int = 4,
                n_tables: int = 6) -> DataFrame:
    """Approximate cosine top-k: score only bucket-mates of each query.

    OR-construction over `n_tables` independent hash tables (union of
    bucket joins, deduped): one table leaves some queries with empty or
    tiny buckets; multiple tables make a candidate-free query
    exponentially unlikely while keeping probe cost ~n_tables *
    corpus/2^n_planes per query.
    """
    dim = 64
    cands = None
    for t in range(n_tables):
        c = rp_lsh_signatures(corpus, vec_col, id_col, n_planes,
                              seed=42 + t, dim=dim)
        q = (rp_lsh_signatures(queries, vec_col, query_id_col, n_planes,
                               seed=42 + t, dim=dim)
             .select(F.col("id").alias("qid"), F.col("v").alias("qv"),
                     F.col("sig").alias("qsig")))
        hit = (broadcast(q).join(c, F.col("sig") == F.col("qsig"))
               .filter(F.col("id") != F.col("qid"))
               .select("qid", "qv", F.col("id").alias("nid"), F.col("v").alias("v")))
        cands = hit if cands is None else cands.unionAll(hit)
    cands = cands.dropDuplicates(["qid", "nid"])
    cos = _dot(F.col("qv"), F.col("v")) / (_norm(F.col("qv")) * _norm(F.col("v")))
    scored = cands.select("qid", "nid", cos.alias("cosine"))
    w = Window.partitionBy("qid").orderBy(F.desc("cosine"), F.asc("nid"))
    return (scored.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("qid", "rank", "nid", "cosine"))
