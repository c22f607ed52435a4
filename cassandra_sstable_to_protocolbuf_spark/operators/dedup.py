"""Deduplication operators: exact, n-gram Jaccard (exact near-dup),
MinHash LSH (approximate near-dup, the 100 TB scale path), SimHash.

Scale design:
* exact_dedup -- one hash aggregation on a content fingerprint; map-side
  partial agg makes the shuffle proportional to distinct docs.
* ngram_jaccard_pairs -- the classic inverted-index join: explode distinct
  shingles, self-join on shingle, count intersections. Exact (no
  probabilistic misses). Shuffle is keyed by shingle; hot shingles (very
  common trigrams) are the skew risk at 100 TB, mitigated by dropping
  shingles whose document frequency exceeds `max_shingle_df` (a common
  shingle carries almost no similarity signal but quadratic join cost --
  the standard prefix-filtering trick).
* minhash_lsh_pairs -- pyspark.ml MinHashLSH over a sparse shingle
  vector; candidates from band-bucket join, then exact-Jaccard verify.
  Linear in corpus size, the scale path when the inverted index is too hot.
* simhash_pairs -- 60-bit SimHash; pigeonhole band join (4 bands of 15
  bits) guarantees every pair within hamming distance 3 shares at least
  one exact band, so candidate generation is an equi-join, then exact
  hamming verify. Exact, not probabilistic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cassandra_sstable_to_protocolbuf_spark.operators.text import fingerprint, shingles, tokens

SIMHASH_BITS = 60
SIMHASH_BANDS = 4
BAND_WIDTH = SIMHASH_BITS // SIMHASH_BANDS  # 15


def exact_dedup(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact dedup on content fingerprint; keeps the lowest id per group."""
    return (
        docs.select(F.col(id_col), fingerprint(F.col(text_col)).alias("fp"))
        .groupBy("fp")
        .agg(F.min(id_col).alias("canonical_id"), F.count(F.lit(1)).alias("n_copies"))
    )


def doc_shingles(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                 n: int = 3) -> DataFrame:
    """(id, shingle) pairs, distinct per document.

    Tokenization is materialized in its own projection before shingling:
    higher-order functions are interpreted (no codegen subexpression
    elimination), so inlining tokens(text) into every get() inside the
    shingle lambda would re-split the text O(doc_len) times per row.
    """
    from cassandra_sstable_to_protocolbuf_spark.session import tune_for_hof_explode, widen
    tune_for_hof_explode(docs.sparkSession)
    docs = widen(docs)
    toks = docs.select(F.col(id_col).alias("doc_id"),
                       tokens(F.col(text_col)).alias("t"))
    return (toks.select("doc_id", shingles(F.col("t"), n).alias("sh"))
            .select("doc_id", F.explode("sh").alias("shingle")))


def ngram_jaccard_pairs(docs: DataFrame, threshold: float = 0.5,
                        text_col: str = "text", id_col: str = "doc_id",
                        n: int = 3, max_shingle_df: int | None = None) -> DataFrame:
    """Exact near-duplicate pairs by n-gram Jaccard >= threshold."""
    sh = doc_shingles(docs, text_col, id_col, n)
    if max_shingle_df is not None:
        hot = (sh.groupBy("shingle").count()
               .filter(F.col("count") > max_shingle_df).select("shingle"))
        sh = sh.join(hot, "shingle", "left_anti")
    counts = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("c"))
    a = sh.select(F.col("doc_id").alias("d1"), "shingle")
    b = sh.select(F.col("doc_id").alias("d2"), "shingle")
    common = (
        a.join(b, "shingle")
        .filter(F.col("d1") < F.col("d2"))
        .groupBy("d1", "d2")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    c1 = counts.select(F.col("doc_id").alias("d1"), F.col("c").alias("c1"))
    c2 = counts.select(F.col("doc_id").alias("d2"), F.col("c").alias("c2"))
    jacc = F.col("n_common").cast("double") / (F.col("c1") + F.col("c2") - F.col("n_common")).cast("double")
    return (
        common.join(c1, "d1").join(c2, "d2")
        .select("d1", "d2", "n_common",
                (F.col("c1") + F.col("c2") - F.col("n_common")).alias("n_union"),
                jacc.alias("jaccard"))
        .filter(F.col("jaccard") >= threshold)
    )


def minhash_lsh_pairs(docs: DataFrame, threshold: float = 0.5,
                      text_col: str = "text", id_col: str = "doc_id",
                      num_hashes: int = 64, num_features: int = 1 << 18) -> DataFrame:
    """Approximate near-dup pairs via MinHashLSH, then exact verify.

    Candidate generation is approxSimilarityJoin (band-bucketed, linear
    scale); every surviving pair is re-checked with exact Jaccard so
    precision is 1.0 (recall is the probabilistic part).
    """
    from pyspark.ml.feature import HashingTF, MinHashLSH

    sh = (docs.select(F.col(id_col).alias("doc_id"),
                      shingles(tokens(F.col(text_col))).alias("sh"))
          .filter(F.size("sh") > 0))
    tf = HashingTF(inputCol="sh", outputCol="features", numFeatures=num_features, binary=True)
    feat = tf.transform(sh)
    lsh = MinHashLSH(inputCol="features", outputCol="hashes", numHashTables=num_hashes, seed=42)
    model = lsh.fit(feat)
    pairs = (
        model.approxSimilarityJoin(feat, feat, 1.0 - threshold, distCol="dist")
        .select(F.col("datasetA.doc_id").alias("d1"),
                F.col("datasetB.doc_id").alias("d2"),
                (1.0 - F.col("dist")).alias("est_jaccard"))
        .filter(F.col("d1") < F.col("d2"))
    )
    return pairs


def simhash_pairs(docs: DataFrame, max_hamming: int = 3,
                  text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact near-dup pairs within `max_hamming` SimHash bit flips.

    Token hash = first 15 hex chars of md5 (60 bits, stays in signed-64
    range in both Spark and DuckDB). SimHash bit b is set when the
    majority of tokens have bit b set. Band join with max_hamming+1
    bands: by pigeonhole, <= max_hamming flips leave at least one band
    untouched, so candidate generation is an equi-join and the result is
    EXACT for any max_hamming < 60 (band count adapts automatically).
    """
    sh = simhash(docs, text_col, id_col)
    n_bands = max_hamming + 1
    if n_bands > SIMHASH_BITS:
        raise ValueError("max_hamming must be < SIMHASH_BITS")
    base = SIMHASH_BITS // n_bands
    extra = SIMHASH_BITS % n_bands  # first `extra` bands get one more bit
    bands = []
    offset = 0
    for b in range(n_bands):
        width = base + (1 if b < extra else 0)
        bands.append(sh.select(
            "doc_id", "simhash", F.lit(b).alias("band"),
            F.shiftright("simhash", offset)
            .bitwiseAND(F.lit((1 << width) - 1)).alias("band_val"),
        ))
        offset += width
    banded = bands[0]
    for more in bands[1:]:
        banded = banded.unionAll(more)
    a = banded.select(F.col("doc_id").alias("d1"), F.col("simhash").alias("h1"),
                      "band", "band_val")
    b_ = banded.select(F.col("doc_id").alias("d2"), F.col("simhash").alias("h2"),
                       "band", "band_val")
    cand = (a.join(b_, ["band", "band_val"])
            .filter(F.col("d1") < F.col("d2"))
            .select("d1", "d2", "h1", "h2").distinct())
    hamming = F.bit_count(F.col("h1").bitwiseXOR(F.col("h2")))
    return (cand.select("d1", "d2", hamming.alias("hamming"))
            .filter(F.col("hamming") <= max_hamming))


def simhash(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """60-bit SimHash per document over distinct tokens."""
    from cassandra_sstable_to_protocolbuf_spark.session import tune_for_hof_explode, widen
    tune_for_hof_explode(docs.sparkSession)
    docs = widen(docs)
    tok = (docs.select(F.col(id_col).alias("doc_id"),
                       F.array_distinct(tokens(F.col(text_col))).alias("dt"))
           .select("doc_id", F.explode("dt").alias("tok")))
    h = F.conv(F.substring(F.md5("tok"), 1, 15), 16, 10).cast("long")
    tok = tok.select("doc_id", h.alias("h"))
    votes = [
        F.sum(F.when(F.shiftright("h", b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1))
        .alias(f"v{b}")
        for b in range(SIMHASH_BITS)
    ]
    agg = tok.groupBy("doc_id").agg(*votes)
    sim = F.lit(0).cast("long")
    for b in range(SIMHASH_BITS):
        sim = sim + F.when(F.col(f"v{b}") > 0, F.lit(1 << b).cast("long")).otherwise(F.lit(0).cast("long"))
    return agg.select("doc_id", sim.alias("simhash"))
