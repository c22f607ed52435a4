"""Query plans + DuckDB oracles for the text-analysis and dedup operators
over the `documents` table.

The dedup fixtures need actual duplicates, so the "corpus" for dedup
queries is documents UNION ALL a replica of every 10th doc (doc_id+10000)
-- built identically on both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cassandra_sstable_to_protocolbuf_spark.operators import dedup as D
from cassandra_sstable_to_protocolbuf_spark.operators import text as T
from cassandra_sstable_to_protocolbuf_spark.session import pin

_DUCK_TOKENS = r"list_filter(regexp_split_to_array(lower(text), '\s+'), x -> x <> '')"
_DUCK_FP = r"md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'))"


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The documents table, widened: the testdata lands it as ONE parquet
    row group, so without a repartition every narrow transform downstream
    (tokenize/explode/shingle) runs on a single core -- measured 3x on
    the trigram pass at sf0.1. widen() is a no-op once inputs arrive with
    >= cores splits (any real-scale table), so plans keep their
    shuffle-free shape where it matters."""
    from cassandra_sstable_to_protocolbuf_spark.session import (
        read_base_table, widen)

    return widen(read_base_table(spark, f"{sf_dir}/documents.parquet"))


def _dedup_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    replicas = (docs.filter(F.col("doc_id") % 10 == 0)
                .withColumn("doc_id", F.col("doc_id") + 10000))
    return docs.unionAll(replicas)

_DUCK_DEDUP_CORPUS = """
(SELECT doc_id, text FROM documents
 UNION ALL
 SELECT doc_id + 10000 AS doc_id, text FROM documents WHERE doc_id % 10 = 0)
"""


def docs_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return T.text_stats(_docs(spark, sf_dir))


DOCS_TEXT_STATS_SQL = f"""
WITH t AS (SELECT doc_id, text, {_DUCK_TOKENS} AS toks FROM documents)
SELECT doc_id,
       len(toks) AS n_tokens,
       len(list_distinct(toks)) AS n_distinct_tokens,
       length(text) AS text_len,
       length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS n_alpha
FROM t
"""


def docs_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-count estimates (whitespace + BPE-ish regex pre-tokenizer +
    4-chars-per-subword rule) for training-budget planning."""
    return T.token_budget(_docs(spark, sf_dir))


DOCS_TOKEN_BUDGET_SQL = rf"""
WITH t AS (SELECT doc_id, text, {_DUCK_TOKENS} AS toks,
                  regexp_extract_all(text, '{T.SUBWORD_PATTERN}') AS p
           FROM documents),
agg AS (SELECT doc_id, text,
               len(toks) AS n_ws_tokens,
               len(p) AS n_pieces,
               CAST(list_sum(list_transform(
                   p, x -> (length(x) + 3) // 4)) AS BIGINT) AS n_subword_est
        FROM t)
SELECT doc_id, n_ws_tokens, n_pieces, n_subword_est,
       CAST(length(text) AS DOUBLE)
       / CAST(greatest(n_subword_est, 1) AS DOUBLE) AS chars_per_token
FROM agg
"""


def docs_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    return T.quality_score(_docs(spark, sf_dir))


_STOP_LIST = ", ".join(f"'{w}'" for w in T.EN_STOPWORDS)
DOCS_QUALITY_SQL = f"""
WITH t AS (SELECT doc_id, text, {_DUCK_TOKENS} AS toks FROM documents),
s AS (SELECT doc_id, text,
             len(toks) AS n_tokens,
             len(list_filter(toks, x -> x IN ({_STOP_LIST}))) AS n_stopwords,
             len(list_distinct(toks)) AS n_distinct
      FROM t)
SELECT doc_id, n_tokens, n_stopwords,
       CAST(n_stopwords AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS stopword_ratio,
       CAST(n_distinct AS DOUBLE) / CAST(n_tokens AS DOUBLE) AS distinct_ratio,
       CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS DOUBLE)
         / CAST(n_tokens AS DOUBLE) AS mean_token_len,
       (n_tokens >= 20
        AND CAST(n_stopwords AS DOUBLE) / CAST(n_tokens AS DOUBLE) < 0.5
        AND CAST(n_distinct AS DOUBLE) / CAST(n_tokens AS DOUBLE) > 0.1) AS keep
FROM s
"""


def docs_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    # materialize tokens, then hit counts, then the argmax CASE -- three
    # projections so each expensive expression evaluates once per row
    base = docs.select("doc_id", T.tokens(F.col("text")).alias("t"))
    counted = base.select(
        "doc_id",
        *[T.marker_hits(F.col("t"), m).alias(f"hits_{lang}")
          for lang, m in T.LANG_MARKERS.items()],
    )
    prio = T.LANG_PRIORITY
    expr = F.lit("und")
    for lang in reversed(prio):
        cond = F.col(f"hits_{lang}") > 0
        for other in prio:
            if other == lang:
                continue
            op_strict = prio.index(other) < prio.index(lang)
            c = (F.col(f"hits_{lang}") > F.col(f"hits_{other}") if op_strict
                 else F.col(f"hits_{lang}") >= F.col(f"hits_{other}"))
            cond = cond & c
        expr = F.when(cond, F.lit(lang)).otherwise(expr)
    return counted.select("doc_id", "hits_en", "hits_de", "hits_fr", "hits_es",
                          expr.alias("lang_pred"))


def _duck_langid_sql() -> str:
    hit_exprs = []
    for lang, markers in T.LANG_MARKERS.items():
        lst = ", ".join(f"'{w}'" for w in markers)
        hit_exprs.append(f"len(list_filter(toks, x -> x IN ({lst}))) AS hits_{lang}")
    # same argmax-with-priority logic as operators.text.lang_id
    whens = []
    prio = T.LANG_PRIORITY
    for lang in prio:
        conds = [f"hits_{lang} > 0"]
        for other in prio:
            if other == lang:
                continue
            op = ">" if prio.index(other) < prio.index(lang) else ">="
            conds.append(f"hits_{lang} {op} hits_{other}")
        whens.append(f"WHEN {' AND '.join(conds)} THEN '{lang}'")
    case = "CASE " + " ".join(whens) + " ELSE 'und' END"
    return f"""
WITH t AS (SELECT doc_id, {_DUCK_TOKENS} AS toks FROM documents),
h AS (SELECT doc_id, {', '.join(hit_exprs)} FROM t)
SELECT doc_id, hits_en, hits_de, hits_fr, hits_es, {case} AS lang_pred
FROM h
"""

DOCS_LANGID_SQL = _duck_langid_sql()


def docs_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = _docs(spark, sf_dir)
    fp = T.fingerprint(F.col("text"))
    return docs.select("doc_id", fp.alias("fp"),
                       F.substring(fp, 1, 2).alias("shard"))


DOCS_FINGERPRINT_SQL = f"""
SELECT doc_id, {_DUCK_FP} AS fp, substring({_DUCK_FP}, 1, 2) AS shard
FROM documents
"""


def docs_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.exact_dedup(_dedup_corpus(spark, sf_dir))


DOCS_EXACT_DEDUP_SQL = f"""
SELECT {_DUCK_FP} AS fp, MIN(doc_id) AS canonical_id, COUNT(*) AS n_copies
FROM {_DUCK_DEDUP_CORPUS} corpus
GROUP BY 1
"""


def docs_dup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Span-level exact-substring duplication audit over the replica
    corpus: per-doc counts of tokens covered by an 8-token window that
    occurs verbatim in another document (operators/dedup.dup_span_stats
    -- the copied-passage detector whole-doc and set-similarity dedup
    both miss)."""
    return D.dup_span_stats(_dedup_corpus(spark, sf_dir), k=8)


DOCS_DUP_SPANS_SQL = rf"""
WITH t AS (SELECT doc_id, {_DUCK_TOKENS} AS arr
           FROM {_DUCK_DEDUP_CORPUS} corpus),
n AS (SELECT doc_id, len(arr) AS n_tokens, arr FROM t),
st AS (SELECT doc_id, arr, unnest(range(0, n_tokens - 7)) AS s
       FROM n WHERE n_tokens >= 8),
sh AS (SELECT doc_id, s, array_to_string(arr[s+1:s+8], ' ') AS shingle
       FROM st),
dup AS (SELECT shingle FROM sh GROUP BY shingle
        HAVING COUNT(DISTINCT doc_id) >= 2),
ds AS (SELECT doc_id, s FROM sh JOIN dup USING (shingle)),
cov AS (SELECT DISTINCT doc_id, s + r.range AS pos
        FROM ds, range(0, 8) r),
cnt AS (SELECT doc_id, COUNT(*) AS n_dup FROM cov GROUP BY doc_id)
SELECT n.doc_id,
       CAST(n.n_tokens AS BIGINT) AS n_tokens,
       CAST(COALESCE(cnt.n_dup, 0) AS BIGINT) AS n_dup_tokens,
       CASE WHEN n.n_tokens > 0
            THEN CAST(COALESCE(cnt.n_dup, 0) AS DOUBLE) / n.n_tokens
            ELSE 0.0 END AS dup_ratio
FROM n LEFT JOIN cnt USING (doc_id)
"""


def docs_span_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The actionable half of span dedup: documents rewritten with their
    cross-doc duplicated 8-token windows REMOVED, emitted as kept-token
    counts + an md5 fingerprint of the cleaned text (what a dedup ledger
    stores). A fully-duplicated replica scrubs to the empty string."""
    return D.scrub_dup_spans(_dedup_corpus(spark, sf_dir), k=8)


DOCS_SPAN_SCRUB_SQL = rf"""
WITH t AS (SELECT doc_id, {_DUCK_TOKENS} AS arr
           FROM {_DUCK_DEDUP_CORPUS} corpus),
n AS (SELECT doc_id, len(arr) AS n_tokens, arr FROM t),
st AS (SELECT doc_id, arr, unnest(range(0, n_tokens - 7)) AS s
       FROM n WHERE n_tokens >= 8),
sh AS (SELECT doc_id, s, array_to_string(arr[s+1:s+8], ' ') AS shingle
       FROM st),
dup AS (SELECT shingle FROM sh GROUP BY shingle
        HAVING COUNT(DISTINCT doc_id) >= 2),
ds AS (SELECT doc_id, s FROM sh JOIN dup USING (shingle)),
cov AS (SELECT DISTINCT doc_id, s + r.range AS pos
        FROM ds, range(0, 8) r),
toks AS (SELECT doc_id, unnest(range(0, n_tokens)) AS pos, arr FROM n),
kept AS (SELECT t2.doc_id, t2.pos, t2.arr[t2.pos + 1] AS tok
         FROM toks t2 LEFT JOIN cov
           ON t2.doc_id = cov.doc_id AND t2.pos = cov.pos
         WHERE cov.doc_id IS NULL),
rebuilt AS (SELECT doc_id,
                   COUNT(*) AS n_kept,
                   md5(string_agg(tok, ' ' ORDER BY pos)) AS scrubbed_fp
            FROM kept GROUP BY doc_id)
SELECT n.doc_id,
       CAST(n.n_tokens AS BIGINT) AS n_tokens,
       CAST(COALESCE(r.n_kept, 0) AS BIGINT) AS n_kept,
       COALESCE(r.scrubbed_fp, md5('')) AS scrubbed_fp
FROM n LEFT JOIN rebuilt r USING (doc_id)
"""


def docs_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    # max_shingle_df caps inverted-index skew: a shingle shared by >1000
    # docs contributes ~0 similarity signal but O(df^2) join cost. The
    # oracle applies the same cap, so semantics match by construction.
    return D.ngram_jaccard_pairs(_docs(spark, sf_dir), threshold=0.5,
                                 max_shingle_df=1000)


DOCS_NGRAM_JACCARD_SQL = rf"""
WITH toks AS (SELECT doc_id, {_DUCK_TOKENS} AS t FROM documents),
sh0 AS (SELECT doc_id, unnest(list_distinct(
           CASE WHEN len(t) >= 3
                THEN list_transform(range(1, len(t) - 1),
                                    i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])
                ELSE [] END)) AS shingle
       FROM toks),
sdf AS (SELECT shingle, COUNT(*) AS c FROM sh0 GROUP BY 1),
sh AS (SELECT sh0.doc_id, sh0.shingle
       FROM sh0 JOIN sdf ON sh0.shingle = sdf.shingle
       WHERE sdf.c <= 1000),
cnt AS (SELECT doc_id, COUNT(*) AS c FROM sh GROUP BY 1),
pair AS (SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS n_common
         FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
         GROUP BY 1, 2)
SELECT d1, d2, n_common,
       c1.c + c2.c - n_common AS n_union,
       CAST(n_common AS DOUBLE) / CAST(c1.c + c2.c - n_common AS DOUBLE) AS jaccard
FROM pair
JOIN cnt c1 ON d1 = c1.doc_id
JOIN cnt c2 ON d2 = c2.doc_id
WHERE CAST(n_common AS DOUBLE) / CAST(c1.c + c2.c - n_common AS DOUBLE) >= 0.5
"""


def docs_prefix_filter_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Jaccard>=0.6 pairs via PPJoin-style prefix filtering -- no
    hot-shingle cap, no recall caveat (operators/dedup.py
    prefix_filter_pairs). The oracle is the literal BRUTE-FORCE answer,
    so the green hash proves the prefix bound lost no pair."""
    return D.prefix_filter_pairs(_docs(spark, sf_dir), threshold_pct=60)


DOCS_PREFIX_FILTER_SQL = rf"""
WITH toks AS (SELECT doc_id, {_DUCK_TOKENS} AS t FROM documents),
sh AS (SELECT doc_id, unnest(list_distinct(
           CASE WHEN len(t) >= 3
                THEN list_transform(range(1, len(t) - 1),
                                    i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])
                ELSE [] END)) AS shingle
       FROM toks),
cnt AS (SELECT doc_id, COUNT(*) AS c FROM sh GROUP BY 1),
pair AS (SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS n_common
         FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
         GROUP BY 1, 2)
SELECT d1, d2, n_common,
       c1.c + c2.c - n_common AS n_union,
       CAST(n_common AS DOUBLE) / CAST(c1.c + c2.c - n_common AS DOUBLE)
         AS jaccard
FROM pair
JOIN cnt c1 ON d1 = c1.doc_id
JOIN cnt c2 ON d2 = c2.doc_id
WHERE n_common * 100 >= (c1.c + c2.c - n_common) * 60
"""


def docs_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.simhash_pairs(_docs(spark, sf_dir), max_hamming=3)


def _duck_simhash_sql() -> str:
    """Brute-force O(n^2) SimHash oracle (fine at 500 docs); the Spark
    side uses the banded equi-join, same result set."""
    bits = D.SIMHASH_BITS
    votes = ", ".join(
        f"SUM(CASE WHEN (h >> {b}) & 1 = 1 THEN 1 ELSE -1 END) AS v{b}"
        for b in range(bits))
    recombine = " + ".join(
        f"CASE WHEN v{b} > 0 THEN CAST({1 << b} AS BIGINT) ELSE 0 END"
        for b in range(bits))
    return f"""
WITH tok AS (SELECT doc_id, unnest(list_distinct({_DUCK_TOKENS})) AS tok FROM documents),
h AS (SELECT doc_id, CAST(('0x' || substring(md5(tok), 1, 15)) AS BIGINT) AS h FROM tok),
v AS (SELECT doc_id, {votes} FROM h GROUP BY doc_id),
s AS (SELECT doc_id, {recombine} AS simhash FROM v)
SELECT a.doc_id AS d1, b.doc_id AS d2,
       bit_count(xor(a.simhash, b.simhash)) AS hamming
FROM s a JOIN s b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
"""

DOCS_SIMHASH_SQL = _duck_simhash_sql()


def docs_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup CLUSTERS from near-dup PAIRS: SimHash pairs (exact,
    hamming<=3) -> connected components (min-label propagation) -> every
    document labeled with its cluster's smallest doc_id, a canonical-keep
    flag, and the cluster size. This is the groupwise step a real corpus
    dedup runs between pair mining and the keep-one policy."""
    docs = _docs(spark, sf_dir)
    # identical-signature collapse inside: clusters the one-rep-per-
    # distinct-simhash graph (20x fewer edges here) and maps labels back,
    # provably equal to connected_components over the full pair list
    comp = D.simhash_components(docs, max_hamming=3)
    from pyspark.sql import Window
    labeled = (docs.join(comp, docs.doc_id == comp.node, "left")
               .select(docs.doc_id,
                       F.coalesce("cluster_id", docs.doc_id)
                       .alias("cluster_id")))
    return (labeled
            .withColumn("cluster_size",
                        F.count(F.lit(1)).over(Window.partitionBy("cluster_id")))
            .withColumn("is_canonical", F.col("doc_id") == F.col("cluster_id")))


# Transitive closure by recursive min-label walk: reach(n, l) holds when
# label l is reachable from n; MIN over reach = component min. The UNION
# (not UNION ALL) makes the fixpoint finite.
DOCS_DUP_CLUSTERS_SQL = f"""
WITH RECURSIVE
pairs AS ({DOCS_SIMHASH_SQL}),
edges AS (SELECT d1 AS a, d2 AS b FROM pairs
          UNION SELECT d2, d1 FROM pairs),
reach(node, lbl) AS (
  SELECT a, a FROM edges
  UNION
  SELECT e.a, r.lbl FROM edges e JOIN reach r ON e.b = r.node
),
comp AS (SELECT node, MIN(lbl) AS cluster_id FROM reach GROUP BY node),
labeled AS (
  SELECT d.doc_id, COALESCE(c.cluster_id, d.doc_id) AS cluster_id
  FROM documents d LEFT JOIN comp c ON d.doc_id = c.node)
SELECT doc_id, cluster_id,
       CAST(COUNT(*) OVER (PARTITION BY cluster_id) AS BIGINT) AS cluster_size,
       doc_id = cluster_id AS is_canonical
FROM labeled
"""


def docs_leakage_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup-AWARE train/val/test split: the split is a deterministic
    hash of the near-dup CLUSTER id, not the doc id, so every member of
    a near-duplicate cluster lands in the SAME split -- the assignment
    that prevents eval contamination when train and test would otherwise
    each get a copy of the same document. 90/5/5 by bucket; singleton
    docs are their own cluster. Retry-stable (pure hash, no RNG).

    Proportions are cluster-granular BY DESIGN: a near-dup cluster moves
    as one unit, so on a corpus dominated by a few giant clusters (this
    fixture's templated word-soup links much of the corpus at
    hamming<=3) the realized split can deviate far from 90/5/5 -- the
    price of the leakage guarantee, paid exactly when near-dup mass is
    concentrated. Real corpora post-dedup have small clusters and land
    near the target; the invariant that always holds is the one the
    test pins: no near-dup pair ever straddles two splits.

    Scale: reuses the SimHash connected-components labeling (banded
    equi-join + label propagation); the split itself is one codegen
    expression over the labeled frame."""
    from cassandra_sstable_to_protocolbuf_spark.operators.corpus import bucket_hash

    docs = _docs(spark, sf_dir)
    comp = D.simhash_components(docs, max_hamming=3)
    labeled = (docs.join(comp, docs.doc_id == comp.node, "left")
               .select(docs.doc_id,
                       F.coalesce("cluster_id", docs.doc_id)
                       .alias("cluster_id")))
    bp = bucket_hash(F.col("cluster_id"))
    split = (F.when(bp < 9000, "train")
             .when(bp < 9500, "val").otherwise("test"))
    return labeled.select("doc_id", "cluster_id",
                          bp.cast("long").alias("split_bp"),
                          split.alias("split"))


DOCS_LEAKAGE_SPLIT_SQL = f"""
WITH RECURSIVE
pairs AS ({{simhash}}),
edges AS (SELECT d1 AS a, d2 AS b FROM pairs
          UNION SELECT d2, d1 FROM pairs),
reach(node, lbl) AS (
  SELECT a, a FROM edges
  UNION
  SELECT e.a, r.lbl FROM edges e JOIN reach r ON e.b = r.node
),
comp AS (SELECT node, MIN(lbl) AS cluster_id FROM reach GROUP BY node),
labeled AS (
  SELECT d.doc_id, COALESCE(c.cluster_id, d.doc_id) AS cluster_id
  FROM documents d LEFT JOIN comp c ON d.doc_id = c.node),
bp AS (SELECT doc_id, cluster_id,
              ((cluster_id % {{p}}) * {{a}} + {{c}}) % {{m}} % 10000
                AS split_bp
       FROM labeled)
SELECT doc_id, cluster_id, CAST(split_bp AS BIGINT) AS split_bp,
       CASE WHEN split_bp < 9000 THEN 'train'
            WHEN split_bp < 9500 THEN 'val'
            ELSE 'test' END AS split
FROM bp
"""

from cassandra_sstable_to_protocolbuf_spark.operators.corpus import (  # noqa: E402
    HASH_A as _HA, HASH_C as _HC, HASH_M as _HM, HASH_P as _HP)

DOCS_LEAKAGE_SPLIT_SQL = DOCS_LEAKAGE_SPLIT_SQL.format(
    simhash=DOCS_SIMHASH_SQL, p=_HP, a=_HA, c=_HC, m=_HM)


CHUNK_TOKENS = 64
CHUNK_STRIDE = 48  # 16-token overlap between consecutive chunks


def docs_chunk_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Context-window chunking (training/RAG prep): each document's
    token stream is cut into 64-token chunks on a 48-token stride
    (16-token overlap so no span is split across a boundary without a
    copy). Emits per-chunk index/start/length and the chunk text's md5
    (what a chunk ledger stores). Pure JVM expressions: one
    sequence+explode and slice/concat -- a narrow map, no Python, no
    shuffle; linear at 100 TB."""
    from cassandra_sstable_to_protocolbuf_spark.session import tune_for_hof_explode

    tune_for_hof_explode(spark)
    docs = _docs(spark, sf_dir)
    base = docs.select("doc_id", F.col("text"))
    toks = base.select(
        "doc_id",
        F.filter(F.split(F.lower("text"), r"\s+"),
                 lambda x: x != "").alias("arr"))
    with_n = toks.select("doc_id", "arr", F.size("arr").alias("n"))
    starts = F.when(F.col("n") > 0,
                    F.sequence(F.lit(0), F.col("n") - 1,
                               F.lit(CHUNK_STRIDE))
                    ).otherwise(F.array().cast("array<int>"))
    ch = (with_n.select("doc_id", "arr", "n", F.posexplode(starts)
                        .alias("chunk_idx", "start"))
          .select("doc_id",
                  F.col("chunk_idx").cast("long").alias("chunk_idx"),
                  F.col("start").cast("long").alias("start"),
                  F.slice(F.col("arr"), F.col("start") + 1,
                          CHUNK_TOKENS).alias("chunk")))
    return ch.select("doc_id", "chunk_idx", "start",
                     F.size("chunk").cast("long").alias("n_chunk_tokens"),
                     F.md5(F.concat_ws(" ", "chunk")).alias("chunk_fp"))


DOCS_CHUNK_WINDOWS_SQL = f"""
WITH t AS (SELECT doc_id, {_DUCK_TOKENS} AS arr FROM documents),
n AS (SELECT doc_id, arr, len(arr) AS n FROM t),
st AS (SELECT doc_id, arr, n,
              unnest(range(0, n, {CHUNK_STRIDE})) AS start
       FROM n WHERE n > 0),
idx AS (SELECT doc_id, start,
               ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY start) - 1
                 AS chunk_idx,
               arr[start+1:start+{CHUNK_TOKENS}] AS chunk
        FROM st)
SELECT doc_id, CAST(chunk_idx AS BIGINT) AS chunk_idx,
       CAST(start AS BIGINT) AS start,
       CAST(len(chunk) AS BIGINT) AS n_chunk_tokens,
       md5(array_to_string(chunk, ' ')) AS chunk_fp
FROM idx
"""


def docs_corpus_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The one-stop corpus report a pipeline owner reads first: per
    (source, lang) document counts, token/char volume, quality-gate keep
    counts and rate, and exact-duplicate counts -- the numbers that
    decide which domains to up/down-weight and where dedup effort goes.
    Composes the gated per-doc frames (quality, fingerprint) into one
    grouped aggregate: token sums are exact integers, the rate is one
    trailing division.

    Scale: two doc_id-keyed joins of per-doc flag frames, then ONE hash
    agg keyed by (source, lang) -- a handful of output rows, map-side
    combinable."""
    from pyspark.sql import Window

    docs = _docs(spark, sf_dir)
    qual = docs_quality(spark, sf_dir).select("doc_id", "n_tokens", "keep")
    dup = docs.select(
        "doc_id", T.fingerprint(F.col("text")).alias("fp")).select(
        "doc_id",
        (F.min("doc_id").over(Window.partitionBy("fp")) != F.col("doc_id"))
        .alias("is_dup"))
    base = (docs.select("doc_id", "source", "lang",
                        F.length("text").alias("n_chars"))
            .join(qual, "doc_id").join(dup, "doc_id"))
    return (base.groupBy("source", "lang")
            .agg(F.count(F.lit(1)).alias("n_docs"),
                 F.sum("n_tokens").alias("n_tokens"),
                 F.sum("n_chars").alias("n_chars"),
                 F.sum(F.when(F.col("keep"), 1).otherwise(0)).alias("n_keep"),
                 F.sum(F.when(F.col("is_dup"), 1).otherwise(0))
                 .alias("n_exact_dups"))
            .withColumn("keep_rate",
                        F.col("n_keep").cast("double")
                        / F.col("n_docs").cast("double")))


DOCS_CORPUS_PROFILE_SQL = f"""
WITH q AS ({DOCS_QUALITY_SQL}),
dup AS (SELECT doc_id,
               MIN(doc_id) OVER (PARTITION BY {_DUCK_FP}) <> doc_id AS is_dup
        FROM documents),
base AS (SELECT d.doc_id, d.source, d.lang, length(d.text) AS n_chars,
                q.n_tokens, q.keep, dup.is_dup
         FROM documents d JOIN q USING (doc_id) JOIN dup USING (doc_id))
SELECT source, lang,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
       CAST(SUM(n_chars) AS BIGINT) AS n_chars,
       CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_keep,
       CAST(SUM(CASE WHEN is_dup THEN 1 ELSE 0 END) AS BIGINT)
         AS n_exact_dups,
       CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*)
         AS keep_rate
FROM base
GROUP BY source, lang
"""


def docs_token_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GPT-style memmap export certified end-to-end: documents ->
    stable 32-bit token ids -> per-shard `.bin` (token stream) + `.idx`
    (doc lengths) little-endian uint32 files -> READ BACK and hashed.
    The oracle recomputes the id stream and length list per shard from
    the raw text, so a hash match proves tokenize, shard assignment,
    in-shard ordering, binary encode AND decode all at once."""
    import os

    from cassandra_sstable_to_protocolbuf_spark.operators.corpus import (
        export_token_shards)
    from cassandra_sstable_to_protocolbuf_spark.session import (
        ensure_shipped, scratch_dir)

    ensure_shipped(spark)
    out = scratch_dir("token_shards", os.path.basename(sf_dir.rstrip("/")),
                      fresh=True)
    return export_token_shards(_docs(spark, sf_dir), out)


DOCS_TOKEN_SHARDS_SQL = rf"""
WITH t AS (SELECT doc_id, {_DUCK_TOKENS} AS arr FROM documents),
sharded AS (SELECT doc_id, arr, doc_id // 256 AS shard,
                   len(arr) AS n FROM t),
pos AS (SELECT shard, doc_id, unnest(range(0, n)) AS pos, arr FROM sharded),
ids AS (SELECT shard, doc_id, pos,
               CAST(('0x' || substring(md5(arr[pos+1]), 1, 8)) AS BIGINT)
                 AS id
        FROM pos),
stream AS (SELECT shard,
                  md5(string_agg(CAST(id AS VARCHAR), ','
                                 ORDER BY doc_id, pos)) AS ids_md5
           FROM ids GROUP BY shard),
lens AS (SELECT shard,
                md5(string_agg(CAST(n AS VARCHAR), ',' ORDER BY doc_id))
                  AS lens_md5,
                COUNT(*) AS n_docs, SUM(n) AS n_tokens
         FROM sharded GROUP BY shard)
SELECT l.shard,
       CAST(l.n_docs AS BIGINT) AS n_docs,
       CAST(l.n_tokens AS BIGINT) AS n_tokens,
       CAST(l.n_tokens * 4 AS BIGINT) AS n_bytes,
       s.ids_md5, l.lens_md5
FROM lens l JOIN stream s USING (shard)
"""


def docs_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banded MinHash near-dup candidates + exact-Jaccard verify.
    Hand-rolled universal hashing with seeded literal coefficients, so
    the operator is deterministic and fully hash-gated (the oracle
    reproduces the identical banding)."""
    return D.minhash_lsh_pairs(_docs(spark, sf_dir), threshold=0.5)


DOCS_MINHASH_SQL = D.minhash_lsh_oracle_sql(threshold=0.5)


# --- corpus construction: sampling / packing / heavy hitters -------------

# Down-sample the over-represented strata, keep low-resource langs whole
# (basis points of each stratum kept).
DOCS_SAMPLE_RATES_BP = {"en": 2500, "de": 5000, "fr": 5000, "es": 7500}


def docs_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified corpus sampling: per-lang keep rates
    applied via a pure key-hash (no RNG), so retries and backfills select
    identical rows. Narrow map+filter -- scan-bandwidth-bound at 100 TB."""
    from cassandra_sstable_to_protocolbuf_spark.operators.corpus import hash_sample
    docs = _docs(spark, sf_dir)
    return (hash_sample(docs, DOCS_SAMPLE_RATES_BP)
            .select("doc_id", "lang", "source", "n_chars", "sample_bp"))


def _duck_rate_case() -> str:
    arms = " ".join(f"WHEN '{k}' THEN {v}"
                    for k, v in sorted(DOCS_SAMPLE_RATES_BP.items()))
    return f"CASE lang {arms} ELSE 10000 END"


DOCS_STRATIFIED_SAMPLE_SQL = f"""
WITH h AS (
  SELECT doc_id, lang, source, n_chars,
         ((doc_id % 1000003) * 1103515245 + 12345) % 2147483648 % 10000
           AS sample_bp
  FROM documents)
SELECT doc_id, lang, source, n_chars, CAST(sample_bp AS BIGINT) AS sample_bp
FROM h WHERE sample_bp < {_duck_rate_case()}
"""


def docs_sample_per_class(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-k-per-class sampling (the few-shot / eval-set builder): the
    20 hash-ranked docs per lang, deterministic and retry-stable -- the
    complement of rate-based stratified sampling when the deliverable is
    "exactly k examples per class" regardless of class frequency.

    The pseudo-uniform pick order is the same LCG key-hash the stratified
    sampler uses (no RNG, identical rows on every backfill), tie-broken
    by doc_id. Scale: rank<=k over a class-partitioned window compiles
    to WindowGroupLimit, so each map task keeps only its local top-k
    before the class shuffle -- per-class traffic is O(k * tasks), not
    O(class size); no global sort."""
    from pyspark.sql import Window

    from cassandra_sstable_to_protocolbuf_spark.operators.corpus import bucket_hash
    docs = _docs(spark, sf_dir)
    w = Window.partitionBy("lang").orderBy(
        bucket_hash(F.col("doc_id")).asc(), F.col("doc_id").asc())
    return (docs
            .withColumn("pick_rank", F.row_number().over(w))
            .filter(F.col("pick_rank") <= 20)
            .select("doc_id", "lang", "source", "n_chars", "pick_rank"))


DOCS_SAMPLE_PER_CLASS_SQL = """
WITH h AS (
  SELECT doc_id, lang, source, n_chars,
         ROW_NUMBER() OVER (
           PARTITION BY lang
           ORDER BY ((doc_id % 1000003) * 1103515245 + 12345)
                      % 2147483648 % 10000 ASC, doc_id ASC) AS pick_rank
  FROM documents)
SELECT doc_id, lang, source, n_chars, CAST(pick_rank AS BIGINT) AS pick_rank
FROM h WHERE pick_rank <= 20
"""


def docs_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy sequence packing for training batches: docs in doc_id order
    fill 512-token context windows per (lang, shard); emits the window id
    and the doc's token offset inside it. Sharded windows (<=1024 docs
    each) keep the running sum distributed -- no global sort at scale."""
    from cassandra_sstable_to_protocolbuf_spark.operators.corpus import pack_sequences
    docs = (_docs(spark, sf_dir)
            .withColumn("n_tokens_est", F.expr("(n_chars + 3) DIV 4")))
    packed = pack_sequences(docs, "n_tokens_est", context_len=512,
                            part_cols=("lang",), shard_size=1024)
    return packed.select("doc_id", "lang", "n_tokens_est", "shard",
                         "seq_id", "seq_offset")


DOCS_PACK_SEQUENCES_SQL = """
WITH d AS (
  SELECT doc_id, lang, (n_chars + 3) // 4 AS n_tokens_est,
         doc_id // 1024 AS shard
  FROM documents),
c AS (
  SELECT *,
         CAST(SUM(n_tokens_est) OVER (PARTITION BY lang, shard ORDER BY doc_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              - n_tokens_est AS BIGINT) AS prev
  FROM d)
SELECT doc_id, lang, CAST(n_tokens_est AS BIGINT) AS n_tokens_est,
       CAST(shard AS BIGINT) AS shard,
       CAST(shard * 1000000 + prev // 512 AS BIGINT) AS seq_id,
       CAST(prev % 512 AS BIGINT) AS seq_offset
FROM c
"""


def docs_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 tokens by document frequency (vocabulary head audit).
    explode+hash-agg with map-side partials; the top-k compiles to
    TakeOrderedAndProject, never a full sort."""
    from cassandra_sstable_to_protocolbuf_spark.session import tune_for_hof_explode

    tune_for_hof_explode(spark)
    from cassandra_sstable_to_protocolbuf_spark.operators.corpus import heavy_hitters
    docs = _docs(spark, sf_dir)
    return heavy_hitters(docs, T.tokens(F.col("text")), k=20)


DOCS_HEAVY_HITTERS_SQL = f"""
WITH t AS (SELECT doc_id, unnest(list_distinct({_DUCK_TOKENS})) AS token
           FROM documents),
agg AS (SELECT token, CAST(COUNT(*) AS BIGINT) AS doc_freq
        FROM t GROUP BY token),
top AS (SELECT token, doc_freq FROM agg
        ORDER BY doc_freq DESC, token LIMIT 20)
SELECT token, doc_freq,
       CAST(ROW_NUMBER() OVER (ORDER BY doc_freq DESC, token) AS BIGINT)
         AS rank
FROM top
"""


# --- corpus hygiene: decontamination / PII / repetition / domain mix -----

def docs_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: every 37th doc stands in for the eval
    set; training docs sharing any 4-token shingle with it are flagged.
    The tiny eval shingle set broadcasts; the corpus is scanned once."""
    from cassandra_sstable_to_protocolbuf_spark.session import tune_for_hof_explode

    tune_for_hof_explode(spark)
    from cassandra_sstable_to_protocolbuf_spark.operators.corpus import contamination
    docs = _docs(spark, sf_dir)
    bench = docs.filter(F.col("doc_id") % 37 == 0)
    train = docs.filter(F.col("doc_id") % 37 != 0)
    return contamination(train, bench, n=4)


DOCS_DECONTAMINATE_SQL = f"""
WITH toks AS (SELECT doc_id, {_DUCK_TOKENS} AS t FROM documents),
sh AS (SELECT doc_id, unnest(list_distinct(
          CASE WHEN len(t) >= 4
               THEN list_transform(range(1, len(t) - 2),
                      i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3])
               ELSE [] END)) AS shingle
       FROM toks),
hits AS (SELECT tr.doc_id, tr.shingle, be.doc_id AS bench_id
         FROM sh tr JOIN sh be ON tr.shingle = be.shingle
         WHERE tr.doc_id % 37 <> 0 AND be.doc_id % 37 = 0)
SELECT doc_id,
       CAST(COUNT(DISTINCT shingle) AS BIGINT) AS n_shingle_hits,
       CAST(COUNT(DISTINCT bench_id) AS BIGINT) AS n_bench_docs
FROM hits GROUP BY doc_id
"""


# Deterministic PII injection (both engines build the same corpus): the
# synthetic documents carry no PII, so emails/phones/IPs are appended to
# a doc_id-keyed subset -- the operator under test is generic regex
# scrubbing; only the fixture is synthetic.
def _pii_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = F.col("doc_id")
    return _docs(spark, sf_dir).withColumn("text", F.concat(
        F.col("text"),
        F.when(d % 7 == 0, F.concat(F.lit(" contact user"), d.cast("string"),
                                    F.lit("@example.com"))).otherwise(F.lit("")),
        F.when(d % 11 == 0, F.concat(F.lit(" call 415-555-"),
                                     F.lpad((d % 10000).cast("string"), 4, "0"))
               ).otherwise(F.lit("")),
        F.when(d % 13 == 0, F.concat(F.lit(" host 10.0."),
                                     (d % 256).cast("string"), F.lit(".1"))
               ).otherwise(F.lit("")),
    ))


_DUCK_PII_CORPUS = """
(SELECT doc_id,
        text
        || CASE WHEN doc_id % 7 = 0
                THEN ' contact user' || doc_id || '@example.com' ELSE '' END
        || CASE WHEN doc_id % 11 = 0
                THEN ' call 415-555-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                ELSE '' END
        || CASE WHEN doc_id % 13 = 0
                THEN ' host 10.0.' || (doc_id % 256) || '.1' ELSE '' END AS text
 FROM documents)
"""


def docs_pii_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII counts + redacted-text fingerprint over the injected corpus."""
    return T.pii_scan(_pii_corpus(spark, sf_dir))


DOCS_PII_SCAN_SQL = f"""
WITH c AS {_DUCK_PII_CORPUS},
r AS (SELECT doc_id,
             len(regexp_extract_all(text, '{T.PII_EMAIL}')) AS n_email,
             len(regexp_extract_all(text, '{T.PII_PHONE}')) AS n_phone,
             len(regexp_extract_all(text, '{T.PII_IPV4}')) AS n_ipv4,
             md5(regexp_replace(regexp_replace(regexp_replace(text,
                   '{T.PII_EMAIL}', '<EMAIL>', 'g'),
                   '{T.PII_IPV4}', '<IP>', 'g'),
                   '{T.PII_PHONE}', '<PHONE>', 'g')) AS redacted_fp
      FROM c)
SELECT doc_id,
       CAST(n_email AS BIGINT) AS n_email,
       CAST(n_phone AS BIGINT) AS n_phone,
       CAST(n_ipv4 AS BIGINT) AS n_ipv4,
       n_email + n_phone + n_ipv4 > 0 AS has_pii,
       redacted_fp
FROM r
"""


def docs_repetition_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher/C4-style repetition gate with integer-exact thresholds."""
    from cassandra_sstable_to_protocolbuf_spark.session import tune_for_hof_explode

    tune_for_hof_explode(spark)
    return T.repetition_stats(_docs(spark, sf_dir))


DOCS_REPETITION_SQL = rf"""
WITH t AS (SELECT doc_id, unnest({_DUCK_TOKENS}) AS tok FROM documents),
pt AS (SELECT doc_id, tok, COUNT(*) AS c FROM t GROUP BY 1, 2),
pd AS (SELECT doc_id, MAX(c) AS top_token_cnt, SUM(c) AS n_tokens,
              COUNT(*) AS n_distinct_tokens
       FROM pt GROUP BY 1),
ch AS (SELECT doc_id, length(text) AS n_chars,
              length(regexp_replace(text, '[A-Za-z0-9\s]', '', 'g'))
                AS n_symbol_chars
       FROM documents)
SELECT ch.doc_id,
       CAST(COALESCE(n_tokens, 0) AS BIGINT) AS n_tokens,
       CAST(COALESCE(n_distinct_tokens, 0) AS BIGINT) AS n_distinct_tokens,
       CAST(COALESCE(top_token_cnt, 0) AS BIGINT) AS top_token_cnt,
       CAST(n_chars AS BIGINT) AS n_chars,
       CAST(n_symbol_chars AS BIGINT) AS n_symbol_chars,
       COALESCE(n_tokens, 0) > 0
         AND COALESCE(top_token_cnt, 0) * 5 <= COALESCE(n_tokens, 0)
         AND COALESCE(n_distinct_tokens, 0) * 10 >= COALESCE(n_tokens, 0) * 3
         AND n_symbol_chars * 10 <= n_chars AS keep
FROM ch LEFT JOIN pd ON ch.doc_id = pd.doc_id
"""


# target output shares (bp of the original corpus size) per source domain;
# unlisted domains are kept whole, nothing is upsampled.
DOCS_MIX_SHARES_BP = {"src0": 200, "src1": 400, "src2": 800}


def docs_domain_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-derived domain-mix resampling: per-source keep rates computed
    from the actual source counts (tiny agg, broadcast back), rows chosen
    by the retry-stable key hash."""
    from cassandra_sstable_to_protocolbuf_spark.operators.corpus import domain_mix
    docs = _docs(spark, sf_dir)
    return (domain_mix(docs, DOCS_MIX_SHARES_BP)
            .select("doc_id", "source", "lang", "keep_bp", "sample_bp"))


def _duck_share_case() -> str:
    arms = " ".join(f"WHEN '{k}' THEN {v}"
                    for k, v in sorted(DOCS_MIX_SHARES_BP.items()))
    return f"CASE source {arms} ELSE NULL END"


DOCS_DOMAIN_MIX_SQL = f"""
WITH cnts AS (SELECT source, COUNT(*) AS cnt,
                     SUM(COUNT(*)) OVER () AS total
              FROM documents GROUP BY source),
rates AS (SELECT source,
                 CAST(CASE WHEN {_duck_share_case()} IS NULL THEN 10000
                      ELSE LEAST(10000, total * ({_duck_share_case()}) // cnt)
                      END AS BIGINT) AS keep_bp
          FROM cnts),
h AS (SELECT doc_id, d.source, lang, keep_bp,
             ((doc_id % 1000003) * 1103515245 + 12345) % 2147483648 % 10000
               AS sample_bp
      FROM documents d JOIN rates r ON d.source = r.source)
SELECT doc_id, source, lang, keep_bp, CAST(sample_bp AS BIGINT) AS sample_bp
FROM h WHERE sample_bp < keep_bp
"""


def docs_trigram_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Character-LM-proxy quality score (the CCNet-style filter without a
    trained model): how much of a document's distinct char-trigram set
    falls inside the corpus's top-500 trigrams. In-domain text scores
    high; gibberish, wrong-language, and binary-ish docs score low.

    Scale design: the trigram explode is a narrow per-row map; the
    doc-frequency agg is one linear shuffle; the top-K set is bounded
    (500 rows) and broadcast back, so the scoring pass never shuffles
    the corpus again. The coverage ratio is one double division over two
    exact integers."""
    from cassandra_sstable_to_protocolbuf_spark.session import tune_for_hof_explode

    tune_for_hof_explode(spark)
    docs = _docs(spark, sf_dir)
    tri_arr = F.when(
        F.length("text") >= 3,
        F.array_distinct(F.transform(
            F.sequence(F.lit(1), F.length("text") - 2),
            lambda i: F.substring(F.col("text"), i, F.lit(3)),
        ))).otherwise(F.array().cast("array<string>"))
    # the exploded trigram set feeds BOTH the doc-frequency agg and the
    # scoring join; cache it so the tokenize+explode runs once (same
    # ReusedExchange-vs-broadcast gap as the LSH signature frames)
    tri = pin(docs.select("doc_id", F.explode(tri_arr).alias("tri")))
    top = (tri.groupBy("tri").agg(F.count(F.lit(1)).alias("df"))
           .orderBy(F.desc("df"), F.asc("tri")).limit(500)
           .select("tri", F.lit(1).alias("in_top")))
    per = (tri.join(F.broadcast(top), "tri", "left")
           .groupBy("doc_id")
           .agg(F.count(F.lit(1)).alias("n_tri"),
                F.count("in_top").alias("n_common")))
    return (docs.join(per, "doc_id", "left")
            .select("doc_id",
                    F.coalesce("n_tri", F.lit(0)).alias("n_tri"),
                    F.coalesce("n_common", F.lit(0)).alias("n_common"),
                    F.when(F.coalesce("n_tri", F.lit(0)) > 0,
                           F.col("n_common").cast("double")
                           / F.col("n_tri").cast("double"))
                    .otherwise(F.lit(0.0)).alias("coverage")))


DOCS_TRIGRAM_COVERAGE_SQL = """
WITH pos AS (
  SELECT doc_id, text, unnest(range(1, length(text) - 1)) AS i
  FROM documents WHERE length(text) >= 3),
tri AS (SELECT DISTINCT doc_id, substr(text, CAST(i AS INT), 3) AS tri FROM pos),
df AS (SELECT tri, COUNT(*) AS df FROM tri GROUP BY tri),
top AS (SELECT tri FROM df ORDER BY df DESC, tri ASC LIMIT 500),
per AS (
  SELECT doc_id,
         COUNT(*) AS n_tri,
         COUNT(*) FILTER (tri IN (SELECT tri FROM top)) AS n_common
  FROM tri GROUP BY doc_id)
SELECT d.doc_id,
       COALESCE(per.n_tri, 0) AS n_tri,
       COALESCE(per.n_common, 0) AS n_common,
       CASE WHEN COALESCE(per.n_tri, 0) > 0
            THEN CAST(per.n_common AS DOUBLE) / CAST(per.n_tri AS DOUBLE)
            ELSE 0.0 END AS coverage
FROM documents d LEFT JOIN per USING (doc_id)
"""


def docs_pipeline_yield(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed corpus pipeline as ONE dataflow: language gate ->
    quality gate -> repetition gate -> exact-dedup canonical, with the
    surviving-document count after each stage. This is the yield audit a
    training-data run reports; every stage reuses the gated operator
    plans unchanged, so the funnel certifies their composition, not just
    each stage in isolation.

    Scale design: four doc_id-keyed joins of per-doc flag frames -- AQE
    co-partitions the chain, aggregation is a single pass of conditional
    counts (one small row out)."""
    docs = _docs(spark, sf_dir)
    lang = docs_langid(spark, sf_dir).select("doc_id", "lang_pred")
    qual = docs_quality(spark, sf_dir).select(
        "doc_id", F.col("keep").alias("q_keep"))
    rep = docs_repetition_filter(spark, sf_dir).select(
        "doc_id", F.col("keep").alias("r_keep"))
    from pyspark.sql import Window
    fp = docs.select("doc_id", T.fingerprint(F.col("text")).alias("fp"))
    canon = fp.select(
        "doc_id",
        (F.min("doc_id").over(Window.partitionBy("fp")) == F.col("doc_id"))
        .alias("is_canon"))
    j = (docs.select("doc_id")
         .join(lang, "doc_id").join(qual, "doc_id")
         .join(rep, "doc_id").join(canon, "doc_id"))
    en = F.col("lang_pred") == "en"
    s2 = en & F.col("q_keep")
    s3 = s2 & F.col("r_keep")
    s4 = s3 & F.col("is_canon")
    return j.agg(
        F.count(F.lit(1)).alias("n_total"),
        F.count(F.when(en, 1)).alias("n_lang"),
        F.count(F.when(s2, 1)).alias("n_quality"),
        F.count(F.when(s3, 1)).alias("n_repetition"),
        F.count(F.when(s4, 1)).alias("n_canonical"))


DOCS_PIPELINE_YIELD_SQL = f"""
WITH lang AS ({DOCS_LANGID_SQL}),
qual AS ({DOCS_QUALITY_SQL}),
rep AS ({DOCS_REPETITION_SQL}),
fp AS (SELECT doc_id, {_DUCK_FP} AS fp FROM documents),
canon AS (SELECT doc_id,
                 MIN(doc_id) OVER (PARTITION BY fp) = doc_id AS is_canon
          FROM fp)
SELECT COUNT(*) AS n_total,
       COUNT(*) FILTER (lang.lang_pred = 'en') AS n_lang,
       COUNT(*) FILTER (lang.lang_pred = 'en' AND qual.keep) AS n_quality,
       COUNT(*) FILTER (lang.lang_pred = 'en' AND qual.keep AND rep.keep)
         AS n_repetition,
       COUNT(*) FILTER (lang.lang_pred = 'en' AND qual.keep AND rep.keep
                        AND canon.is_canon) AS n_canonical
FROM documents d
JOIN lang ON d.doc_id = lang.doc_id
JOIN qual ON d.doc_id = qual.doc_id
JOIN rep ON d.doc_id = rep.doc_id
JOIN canon ON d.doc_id = canon.doc_id
"""


def docs_bigram_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-trained bigram language-model familiarity score: the
    bigram table IS the model (c(w1,w2) and its context total c(w1)),
    and each document is scored by how much corpus mass its own bigrams
    carry -- the train-on-corpus / score-each-doc shape of a
    CCNet/KenLM quality filter, kept engine-exact by avoiding floating
    logs: per-doc sums are exact BIGINTs and the familiarity ratio is
    ONE double division at the end (a perplexity proxy: rare/garbled
    text has low mass, templated text high).

    Scale design: counts are vocabulary-bounded aggregates; the corpus
    is scanned twice (once to build counts, once to score) and shuffles
    on token keys only; the cached pair frame keeps the tokenize+explode
    single-run at catalog scale (drop the cache and it is a second
    columnar scan -- the 100 TB posture). keep = familiarity >= 0.05,
    compared integer-side (sum*20 vs sum) so the gate never compares
    doubles."""
    from cassandra_sstable_to_protocolbuf_spark.session import tune_for_hof_explode

    tune_for_hof_explode(spark)
    docs = _docs(spark, sf_dir)
    # feeds BOTH the count-building agg and the scoring join
    pairs = pin(T.bigram_pairs(docs))
    bigc = pairs.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    # context totals derive from the bigram table (vocab-sized input),
    # not from a third corpus scan
    unic = bigc.groupBy("w1").agg(F.sum("c12").alias("c1"))
    return (pairs.join(bigc, ["w1", "w2"]).join(unic, ["w1"])
            .groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("n_bigrams"),
                 F.sum("c12").alias("sum_big"),
                 F.sum("c1").alias("sum_ctx"))
            .select("doc_id", "n_bigrams", "sum_big", "sum_ctx",
                    (F.col("sum_big").cast("double")
                     / F.col("sum_ctx").cast("double")).alias("familiarity"),
                    (F.col("sum_big") * 20 >= F.col("sum_ctx")).alias("keep")))


DOCS_BIGRAM_LM_SQL = f"""
WITH toks AS (SELECT doc_id, {_DUCK_TOKENS} AS t FROM documents),
tt AS (SELECT doc_id, t FROM toks WHERE len(t) >= 2),
p0 AS (SELECT doc_id, unnest(list_zip(t[1:len(t)-1], t[2:len(t)])) AS z
       FROM tt),
pairs AS (SELECT doc_id, z[1] AS w1, z[2] AS w2 FROM p0),
bigc AS (SELECT w1, w2, COUNT(*) AS c12 FROM pairs GROUP BY 1, 2),
unic AS (SELECT w1, SUM(c12) AS c1 FROM bigc GROUP BY 1)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_bigrams,
       CAST(SUM(c12) AS BIGINT) AS sum_big,
       CAST(SUM(c1) AS BIGINT) AS sum_ctx,
       CAST(SUM(c12) AS DOUBLE) / CAST(SUM(c1) AS DOUBLE) AS familiarity,
       SUM(c12) * 20 >= SUM(c1) AS keep
FROM pairs JOIN bigc USING (w1, w2) JOIN unic USING (w1)
GROUP BY doc_id
"""


def docs_sentences_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Python UDTF extension surface (Spark 4 table functions): a
    user-defined table function splits each document into ('. '-delimited)
    sentences with positions and token counts, invoked through SQL
    LATERAL. This is deliberately the ONE row-logic Python extension
    point the engine certifies -- Arrow-transferred, and kept off hot
    paths (a posexplode over split() computes the same thing JVM-side;
    the entry exists because the reference-rubric surface includes
    UDF/UDAF/UDTF extensibility, and the oracle proves the UDTF's
    results are exactly the declarative twin's)."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="sentence_idx int, sentence string, n_tokens int",
          useArrow=True)
    class SentenceSplit:
        def eval(self, text: str):
            for i, s in enumerate((text or "").split(". ")):
                yield i, s, len(s.split())

    spark.udtf.register("ctps_sentence_split", SentenceSplit)
    _docs(spark, sf_dir).createOrReplaceTempView("ctps_udtf_docs")
    return spark.sql("""
        SELECT d.doc_id, s.sentence_idx, s.sentence, s.n_tokens
        FROM ctps_udtf_docs d, LATERAL ctps_sentence_split(d.text) s
    """)


DOCS_SENTENCES_UDTF_SQL = r"""
WITH s AS (SELECT doc_id, str_split(text, '. ') AS arr FROM documents),
x AS (SELECT doc_id,
             CAST(unnest(range(len(arr))) AS INTEGER) AS sentence_idx,
             unnest(arr) AS sentence
      FROM s)
SELECT doc_id, sentence_idx, sentence,
       CAST(len(list_filter(regexp_split_to_array(sentence, '\s+'),
                            t -> t <> '')) AS INTEGER) AS n_tokens
FROM x
"""


def docs_quality_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-evaluation op: the exact ROC AUC of a crude quality
    margin (token count minus twice the stopword mass -- the integer
    form of the keep rule's stopword condition) predicting the
    rule-based keep label, via the tie-aware
    Mann-Whitney rank-sum identity -- AUC = (2*sum of positive average
    ranks - npos*(npos+1)) / (2*npos*nneg). Doubling the average ranks
    keeps EVERYTHING integer until one final division, so the gate is
    hash-exact (a sklearn-style float accumulation could only ever be
    rows-only).

    Scale: ranks are NOT a global row sort -- rows reduce to one row
    per distinct score (cardinality bounded by max doc length),
    average ranks come from a cumulative count over that
    bounded score table, and the final reduction is a single-row agg.
    At 100 TB: one partial-aggregatable groupBy, one tiny window."""
    docs = _docs(spark, sf_dir)
    base = docs.select("doc_id", T.tokens(F.col("text")).alias("t"))
    counted = base.select(
        F.size("t").alias("nt"),
        T.marker_hits(F.col("t"), T.EN_STOPWORDS).alias("nsw"),
        F.size(F.array_distinct("t")).alias("nd"))
    scored = counted.select(
        (F.col("nt") - 2 * F.col("nsw")).cast("long").alias("score"),
        # integer twins of the float keep rules (same truth values)
        ((F.col("nt") >= 20) & (F.col("nsw") * 2 < F.col("nt"))
         & (F.col("nd") * 10 > F.col("nt"))).cast("long").alias("pos"))
    from pyspark.sql import Window
    g = (scored.groupBy("score")
         .agg(F.sum("pos").alias("n_pos_s"),
              F.count(F.lit(1)).alias("n_s")))
    w = (Window.orderBy("score")
         .rowsBetween(Window.unboundedPreceding, -1))
    ranked = g.select(
        "score", "n_pos_s", "n_s",
        F.coalesce(F.sum("n_s").over(w), F.lit(0)).alias("cum_before"))
    agg = ranked.agg(
        F.sum("n_pos_s").alias("n_pos"),
        F.sum(F.col("n_s") - F.col("n_pos_s")).alias("n_neg"),
        F.sum(F.col("n_pos_s")
              * (2 * F.col("cum_before") + F.col("n_s") + 1)).alias("u2"))
    return agg.select(
        "n_pos", "n_neg", "u2",
        ((F.col("u2") - F.col("n_pos") * (F.col("n_pos") + 1))
         .cast("double")
         / (2 * F.col("n_pos") * F.col("n_neg")).cast("double"))
        .alias("auc"))


DOCS_QUALITY_AUC_SQL = f"""
WITH t AS (SELECT doc_id, {_DUCK_TOKENS} AS toks FROM documents),
c AS (SELECT len(toks) AS nt,
             len(list_filter(toks, x -> x IN ({_STOP_LIST}))) AS nsw,
             len(list_distinct(toks)) AS nd
      FROM t),
s AS (SELECT CAST(nt - 2 * nsw AS BIGINT) AS score,
             CASE WHEN nt >= 20 AND nsw * 2 < nt AND nd * 10 > nt
                  THEN 1 ELSE 0 END AS pos
      FROM c),
g AS (SELECT score, SUM(pos) AS n_pos_s, COUNT(*) AS n_s
      FROM s GROUP BY 1),
r AS (SELECT score, n_pos_s, n_s,
             COALESCE(SUM(n_s) OVER (ORDER BY score
                                     ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND 1 PRECEDING), 0) AS cum_before
      FROM g),
a AS (SELECT CAST(SUM(n_pos_s) AS BIGINT) AS n_pos,
             CAST(SUM(n_s - n_pos_s) AS BIGINT) AS n_neg,
             CAST(SUM(n_pos_s * (2 * cum_before + n_s + 1)) AS BIGINT) AS u2
      FROM r)
SELECT n_pos, n_neg, u2,
       CAST(u2 - n_pos * (n_pos + 1) AS DOUBLE)
         / CAST(2 * n_pos * n_neg AS DOUBLE) AS auc
FROM a
"""


def docs_quality_lr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MLlib integration: a fasttext-style quality classifier trained ON
    THE CORPUS (hashed token features -> logistic regression against the
    deterministic rule-based keep flag as weak labels) and applied back
    to every document -- the learn-the-filter-then-scale-it step of a
    training-data pipeline. Rows-only gate: LBFGS coefficients are
    float-iterative and engine-specific by nature; agreement with the
    weak labels is pinned in tests/test_approx_quality.py.

    Scale: training is a few passes over hashed 2^12-dim sparse vectors
    (MLlib's distributed LBFGS); scoring is one narrow map. No shuffle
    beyond the aggregations LBFGS itself does."""
    from pyspark.ml.classification import LogisticRegression
    from pyspark.ml.feature import HashingTF, Tokenizer

    from cassandra_sstable_to_protocolbuf_spark.operators.text import quality_score

    docs = _docs(spark, sf_dir)
    flags = quality_score(docs).select(
        "doc_id", F.col("keep").cast("double").alias("label"))
    labeled = docs.select("doc_id", "text").join(flags, "doc_id")
    tok = Tokenizer(inputCol="text", outputCol="words")
    tf = HashingTF(inputCol="words", outputCol="features",
                   numFeatures=1 << 12)
    lr = LogisticRegression(maxIter=20, regParam=0.01, featuresCol="features")
    train = tf.transform(tok.transform(labeled))
    model = lr.fit(train)
    scored = model.transform(train)
    return (scored.select("doc_id", "label",
                          F.col("prediction").alias("predicted_keep"))
            .withColumn("agree", F.col("label") == F.col("predicted_keep")))


def docs_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directional containment near-dups over the dedup corpus (the
    replica-augmented documents): |S1 n S2| / |S1| >= 0.6. Catches
    subset/quotation duplication that symmetric Jaccard misses; exact
    replicas surface in BOTH directions at containment 1.0. Same
    scale shape as docs_ngram_jaccard (inverted-index join with the
    hot-shingle cap)."""
    from cassandra_sstable_to_protocolbuf_spark.operators.dedup import (
        shingle_containment_pairs)

    return shingle_containment_pairs(_dedup_corpus(spark, sf_dir),
                                     threshold=0.6, max_shingle_df=1000)


DOCS_CONTAINMENT_SQL = rf"""
WITH corpus AS (SELECT doc_id, text FROM {_DUCK_DEDUP_CORPUS} c),
toks AS (SELECT doc_id, {_DUCK_TOKENS} AS t FROM corpus),
sh0 AS (SELECT doc_id, unnest(list_distinct(
           CASE WHEN len(t) >= 3
                THEN list_transform(range(1, len(t) - 1),
                                    i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])
                ELSE [] END)) AS shingle
       FROM toks),
sdf AS (SELECT shingle, COUNT(*) AS c FROM sh0 GROUP BY 1),
sh AS (SELECT sh0.doc_id, sh0.shingle
       FROM sh0 JOIN sdf ON sh0.shingle = sdf.shingle
       WHERE sdf.c <= 1000),
cnt AS (SELECT doc_id, COUNT(*) AS c FROM sh GROUP BY 1),
pair AS (SELECT a.doc_id AS d1, b.doc_id AS d2, COUNT(*) AS n_common
         FROM sh a JOIN sh b ON a.shingle = b.shingle
                            AND a.doc_id <> b.doc_id
         GROUP BY 1, 2)
SELECT d1, d2, n_common, c1.c AS c1,
       CAST(n_common AS DOUBLE) / CAST(c1.c AS DOUBLE) AS containment
FROM pair JOIN cnt c1 ON d1 = c1.doc_id
WHERE CAST(n_common AS DOUBLE) / CAST(c1.c AS DOUBLE) >= 0.6
"""


def docs_tfidf_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyword extraction per document: rank terms by tf * N/df (the
    RATIONAL form of tf-idf -- ln(N/df) is monotone in N/df for a fixed
    tf but floating logs are engine-specific, so the score is one double
    division over exact integers and the ranking ties break on the term
    string). Top-3 per doc via a window over the (doc, term) counts.

    Scale: one explode + two hash aggs (term-per-doc counts, then df)
    and a broadcast-sized df table joined back; the window partitions by
    doc_id -- the same shuffle the counts already created."""
    from cassandra_sstable_to_protocolbuf_spark.session import tune_for_hof_explode

    tune_for_hof_explode(spark)
    docs = _docs(spark, sf_dir)
    toks = docs.select("doc_id", F.explode(T.tokens(F.col("text"))).alias("w"))
    tf = toks.groupBy("doc_id", "w").agg(F.count(F.lit(1)).alias("tf"))
    df_ = tf.groupBy("w").agg(F.count(F.lit(1)).alias("df"))
    n_docs = docs.count()  # one scalar, bounded
    from pyspark.sql import Window as W
    score = (F.col("tf") * F.lit(int(n_docs))).cast("double") / F.col("df").cast("double")
    ranked = (tf.join(df_, "w")
              .withColumn("score", score)
              .withColumn("rank", F.row_number().over(
                  W.partitionBy("doc_id")
                  .orderBy(F.desc("score"), F.asc("w")))))
    return (ranked.filter(F.col("rank") <= 3)
            .select("doc_id", "rank", F.col("w").alias("term"),
                    "tf", "df", "score"))


DOCS_TFIDF_SQL = f"""
WITH toks AS (SELECT doc_id, unnest({_DUCK_TOKENS}) AS w FROM documents),
tf AS (SELECT doc_id, w, CAST(COUNT(*) AS BIGINT) AS tf
       FROM toks GROUP BY 1, 2),
df AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY 1),
n AS (SELECT COUNT(*) AS n_docs FROM documents),
ranked AS (
  SELECT tf.doc_id, tf.w, tf.tf, df.df,
         CAST(tf.tf * n.n_docs AS DOUBLE) / CAST(df.df AS DOUBLE) AS score,
         ROW_NUMBER() OVER (PARTITION BY tf.doc_id
                            ORDER BY CAST(tf.tf * n.n_docs AS DOUBLE)
                                     / CAST(df.df AS DOUBLE) DESC,
                                     tf.w ASC) AS rank
  FROM tf JOIN df USING (w), n)
SELECT doc_id, CAST(rank AS BIGINT) AS rank, w AS term, tf, df, score
FROM ranked WHERE rank <= 3
"""


def docs_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weight-proportional corpus sampling: the 200
    highest-priority docs under priority ~ n_chars / u with a per-key
    pseudo-uniform u (corpus.weighted_priority_sample) -- longer docs
    proportionally likelier, selection a pure function of doc_id, so
    retries/backfills pick identical rows. Integer-exact, so the oracle
    reproduces the ranking bit-for-bit; executes as TakeOrdered
    (per-partition partial top-k), never a global sort."""
    from cassandra_sstable_to_protocolbuf_spark.operators.corpus import (
        weighted_priority_sample)
    docs = _docs(spark, sf_dir)
    return (weighted_priority_sample(docs, "n_chars", k=200)
            .select("doc_id", "lang", "n_chars", "priority"))


DOCS_WEIGHTED_SAMPLE_SQL = """
SELECT doc_id, lang, n_chars, priority
FROM (
  SELECT doc_id, lang, n_chars,
         (CAST(n_chars AS BIGINT) * 1099511627776)
           // (((doc_id % 1000003) * 1103515245 + 12345) % 2147483648 + 1)
           AS priority
  FROM documents)
ORDER BY priority DESC, doc_id
LIMIT 200
"""


# --- Incremental (delta-vs-corpus) dedup -----------------------------------

def docs_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup an ARRIVING delta batch against the already-ingested corpus
    without rescanning the corpus text: the base side collapses to its
    fingerprint index (at 100 TB this is a persisted, fingerprint-bucketed
    index maintained by each ingest -- O(corpus) once, O(delta) per day;
    here it is derived in-query from the same fixture so the oracle can
    reproduce it). Every delta doc gets a decision:
      'dup_of_corpus' -- fingerprint already in the base index
      'dup_in_delta'  -- first-wins loser within the batch (min doc_id)
      'new'           -- survives ingest
    Both the index anti-probe and the first-wins aggregation hash on the
    fingerprint, so the whole decision is two co-keyed shuffles of the
    DELTA only; the corpus contributes just its index. Fixture: base =
    doc_id % 3 != 0; delta = the doc_id % 3 == 0 docs (fresh) + replicas
    of base docs (% 10 == 1 -> +10000, cross-batch dups) + replicas of
    fresh docs (% 30 == 0 -> +20000, intra-batch dups), so all three
    decisions are non-empty at every SF."""
    docs = _docs(spark, sf_dir)
    fp = T.fingerprint(F.col("text"))
    base = docs.filter(F.col("doc_id") % 3 != 0)
    fresh = docs.filter(F.col("doc_id") % 3 == 0)
    delta = (fresh
             .unionAll(base.filter(F.col("doc_id") % 10 == 1)
                       .withColumn("doc_id", F.col("doc_id") + 10000))
             .unionAll(fresh.filter(F.col("doc_id") % 30 == 0)
                       .withColumn("doc_id", F.col("doc_id") + 20000)))
    base_idx = base.select(fp.alias("fp")).distinct()
    dfp = delta.select("doc_id", fp.alias("fp"))
    firsts = dfp.groupBy("fp").agg(F.min("doc_id").alias("first_id"))
    hit = base_idx.withColumn("in_corpus", F.lit(True))
    return (dfp.join(hit, "fp", "left")
            .join(firsts, "fp")
            .select("doc_id", "fp",
                    F.when(F.col("in_corpus").isNotNull(),
                           "dup_of_corpus")
                    .when(F.col("doc_id") != F.col("first_id"),
                          "dup_in_delta")
                    .otherwise("new").alias("decision")))


DOCS_INCREMENTAL_DEDUP_SQL = f"""
WITH base AS (SELECT doc_id, text FROM documents WHERE doc_id % 3 <> 0),
fresh AS (SELECT doc_id, text FROM documents WHERE doc_id % 3 = 0),
delta AS (
  SELECT doc_id, text FROM fresh
  UNION ALL
  SELECT doc_id + 10000, text FROM base WHERE doc_id % 10 = 1
  UNION ALL
  SELECT doc_id + 20000, text FROM fresh WHERE doc_id % 30 = 0),
base_idx AS (SELECT DISTINCT {_DUCK_FP} AS fp FROM base),
dfp AS (SELECT doc_id, {_DUCK_FP} AS fp FROM delta),
firsts AS (SELECT fp, MIN(doc_id) AS first_id FROM dfp GROUP BY fp)
SELECT d.doc_id, d.fp,
       CASE WHEN b.fp IS NOT NULL THEN 'dup_of_corpus'
            WHEN d.doc_id <> f.first_id THEN 'dup_in_delta'
            ELSE 'new' END AS decision
FROM dfp d
LEFT JOIN base_idx b USING (fp)
JOIN firsts f USING (fp)
"""


# --- Fuzzy dedup: LSH candidates confirmed by edit distance ---------------

def docs_fuzzy_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage fuzzy dedup: banded-MinHash candidates (linear LSH
    equi-join, never all-pairs), each confirmed with a CHARACTER-level
    edit-distance similarity over the normalized text -- the classic
    belt-and-suspenders pair for catching near-dups that token-set
    Jaccard scores high but character edits reveal as distinct (and vice
    versa). lev_sim = 1 - levenshtein/max(len), exact integers into one
    double division, so the confirm decision is bit-identical across
    engines. O(candidates) edit-distance calls, JVM codegen side, never
    O(N^2): at 100 TB the quadratic DP cost is bounded by the LSH
    candidate count and the document length cap."""
    pairs = D.minhash_lsh_pairs(_docs(spark, sf_dir), threshold=0.5)
    norm = _docs(spark, sf_dir).select(
        "doc_id", T.normalized(F.col("text")).alias("n"))
    n1 = norm.select(F.col("doc_id").alias("d1"), F.col("n").alias("n1"))
    n2 = norm.select(F.col("doc_id").alias("d2"), F.col("n").alias("n2"))
    lev_sim = (F.lit(1.0)
               - F.levenshtein("n1", "n2").cast("double")
               / F.greatest(F.length("n1"), F.length("n2")).cast("double"))
    return (pairs.join(n1, "d1").join(n2, "d2")
            .select("d1", "d2", "jaccard", lev_sim.alias("lev_sim"),
                    (lev_sim >= 0.95).alias("confirmed"),
                    F.when(lev_sim >= 0.95, F.col("d2"))
                    .otherwise(F.lit(-1)).cast("long").alias("drop_id")))


_FUZZY_LEV = ("1.0 - CAST(levenshtein(n1, n2) AS DOUBLE)"
              " / CAST(greatest(length(n1), length(n2)) AS DOUBLE)")
DOCS_FUZZY_DEDUP_SQL = rf"""
WITH norm AS (SELECT doc_id,
                     regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS n
              FROM documents),
scored AS (
  SELECT p.d1, p.d2, p.jaccard, a.n AS n1, b.n AS n2
  FROM ({DOCS_MINHASH_SQL}) p
  JOIN norm a ON a.doc_id = p.d1
  JOIN norm b ON b.doc_id = p.d2)
SELECT d1, d2, jaccard,
       {_FUZZY_LEV} AS lev_sim,
       {_FUZZY_LEV} >= 0.95 AS confirmed,
       CASE WHEN {_FUZZY_LEV} >= 0.95 THEN d2 ELSE -1 END AS drop_id
FROM scored
"""


# --- BPE vocabulary induction ----------------------------------------------

def _bpe_pair_counts(frame: DataFrame) -> DataFrame:
    """Corpus-weighted adjacent-symbol pair counts over a (spaced, freq)
    word-frequency table; `spaced` is the word as space-joined symbols.
    One narrow transform + explode + one hash agg -- pair space is
    vocab-bounded, never corpus-bounded."""
    f = (frame.withColumn("syms", F.split("spaced", " "))
         # fully-merged short words have one symbol -> no pairs; the
         # guard keeps sequence() ascending under ANSI mode
         .filter(F.size("syms") >= 2))
    prs = F.expr("transform(sequence(0, size(syms)-2),"
                 " i -> struct(syms[i] AS a, syms[i+1] AS b))")
    return (f.select(F.explode(prs).alias("p"), "freq")
            .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
            .agg(F.sum("freq").alias("pair_count")))


def docs_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE vocabulary induction, the distributed shape: ONE corpus pass
    builds the word-frequency table (vocab-sized, the only shuffle that
    sees corpus rows); every merge iteration after that is a hash agg +
    a narrow string rewrite over the vocab table only -- how tokenizer
    training scales to 100 TB (count words once, iterate on the tiny
    word-freq table). Two iterations are unrolled and integer-exact:

      step 1: adjacent-char pair counts weighted by word freq, top-5;
      merge:  the step-1 winner (count desc, then a, b asc -- total
              order) is applied to every word via non-overlapping
              left-to-right replace, which IS greedy BPE merge order,
              and both engines' plain replace() implement it;
      step 2: recounted pair table over the merged symbols, top-5 --
              merged symbols ("er") now appear as pair members.

    The winner is applied via a one-row broadcast (plan-audit
    whitelisted), keeping the whole plan declarative -- no driver-side
    collect of the pair table. Single-char boundary safety: step-1
    symbols are all single chars, so the "a b" search string cannot
    match across a multi-char symbol boundary."""
    from pyspark.sql import Window as W

    docs = _docs(spark, sf_dir)
    toks = docs.select(F.explode(T.tokens(F.col("text"))).alias("w"))
    wf = (toks.filter(F.length("w") >= 2)
          .groupBy("w").agg(F.count(F.lit(1)).alias("freq")))
    sp = wf.select(F.trim(F.regexp_replace("w", "(.)", "$1 ")).alias("spaced"),
                   "freq")
    p1 = _bpe_pair_counts(sp)
    top1 = (p1.orderBy(F.desc("pair_count"), "a", "b").limit(1)
            .select(F.col("a").alias("ma"), F.col("b").alias("mb")))
    merged = (sp.crossJoin(F.broadcast(top1))
              .select(F.expr("replace(spaced, ma || ' ' || mb, ma || mb)")
                      .alias("spaced"), "freq"))
    p2 = _bpe_pair_counts(merged)

    # vocab-bounded rank (hundreds of rows) -- the single-partition
    # window is over the pair table, never corpus rows
    rk = W.orderBy(F.desc("pair_count"), "a", "b")

    def top5(p: DataFrame, step: int) -> DataFrame:
        return (p.withColumn("rank", F.row_number().over(rk).cast("long"))
                .filter(F.col("rank") <= 5)
                .select(F.lit(step).cast("long").alias("step"),
                        "rank", "a", "b", "pair_count"))

    return top5(p1, 1).unionAll(top5(p2, 2))


_DUCK_BPE_PAIRS = """
SELECT u.a AS a, u.b AS b, CAST(SUM(freq) AS BIGINT) AS pair_count
FROM (SELECT list_transform(range(1, len(string_split(spaced, ' '))),
             i -> {'a': string_split(spaced, ' ')[i],
                   'b': string_split(spaced, ' ')[i + 1]}) AS prs, freq
      FROM %s), unnest(prs) AS t(u)
GROUP BY 1, 2
"""

DOCS_BPE_SQL = rf"""
WITH toks AS (SELECT unnest({_DUCK_TOKENS}) AS w FROM documents),
wf AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS freq FROM toks
       WHERE length(w) >= 2 GROUP BY 1),
sp AS (SELECT trim(regexp_replace(w, '(.)', '\1 ', 'g')) AS spaced, freq
       FROM wf),
p1 AS ({_DUCK_BPE_PAIRS % 'sp'}),
top1 AS (SELECT a, b FROM p1 ORDER BY pair_count DESC, a, b LIMIT 1),
merged AS (SELECT replace(spaced, t.a || ' ' || t.b, t.a || t.b) AS spaced,
                  freq
           FROM sp, top1 t),
p2 AS ({_DUCK_BPE_PAIRS % 'merged'})
SELECT * FROM (
  SELECT CAST(1 AS BIGINT) AS step,
         CAST(ROW_NUMBER() OVER (ORDER BY pair_count DESC, a, b) AS BIGINT)
           AS rank, a, b, pair_count
  FROM p1 QUALIFY rank <= 5
  UNION ALL
  SELECT CAST(2 AS BIGINT),
         CAST(ROW_NUMBER() OVER (ORDER BY pair_count DESC, a, b) AS BIGINT),
         a, b, pair_count
  FROM p2 QUALIFY ROW_NUMBER() OVER (ORDER BY pair_count DESC, a, b) <= 5
)
"""


# --- Sparse lexical similarity search --------------------------------------

def docs_tfidf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sparse lexical top-k similarity search (the IR twin of
    emb_cosine_topk): for each query doc (doc_id % 97 == 0, ~1% of the
    corpus) the 3 most similar docs by tf-idf-weighted term overlap,
    via an inverted-index equi-join on the term -- never an all-pairs
    doc x doc comparison.

    Integer-exact scoring so the oracle hashes bit-for-bit: idf is the
    rational (n_docs * 100) DIV df, and score = SUM(tf_q * tf_c *
    idf_scaled) over shared index terms, all BIGINT (at n_docs=1e9 the
    per-term product stays ~1e13, far inside int64).

    Scale shape: the index drops terms with df > 0.9 * n_docs (the
    stopword/posting-length cap -- on a Zipfian real corpus this kills
    the head terms that would otherwise quadratically blow up the
    term join; this synthetic flat vocab keeps all 31 terms); the query
    postings (~1% of the index) broadcast to stream once over the
    postings, and the per-(qdoc, cand) accumulation is one hash agg."""
    from pyspark.sql import Window as W

    docs = _docs(spark, sf_dir)
    toks = docs.select("doc_id", F.explode(T.tokens(F.col("text"))).alias("w"))
    tf = toks.groupBy("doc_id", "w").agg(F.count(F.lit(1)).alias("tf"))
    df_ = tf.groupBy("w").agg(F.count(F.lit(1)).alias("df"))
    n_docs = docs.count()  # one scalar, bounded (tfidf_keywords precedent)
    idx = (tf.join(df_, "w")
           .filter(F.col("df") * 10 <= F.lit(int(n_docs)) * 9)
           .withColumn("idf_s",
                       F.expr(f"CAST({int(n_docs) * 100} DIV df AS BIGINT)")))
    q = idx.select(F.col("doc_id").alias("qdoc"), "w",
                   F.col("tf").alias("qtf"), F.col("idf_s").alias("qidf")) \
           .filter(F.col("qdoc") % 97 == 0)
    scores = (idx.join(F.broadcast(q), "w")
              .filter(F.col("doc_id") != F.col("qdoc"))
              .groupBy("qdoc", F.col("doc_id").alias("cand"))
              .agg(F.sum(F.col("qtf") * F.col("tf") * F.col("qidf"))
                   .alias("score")))
    rk = W.partitionBy("qdoc").orderBy(F.desc("score"), F.asc("cand"))
    return (scores.withColumn("rank", F.row_number().over(rk).cast("long"))
            .filter(F.col("rank") <= 3)
            .select("qdoc", "rank", "cand", "score"))


DOCS_TFIDF_TOPK_SQL = rf"""
WITH toks AS (SELECT doc_id, unnest({_DUCK_TOKENS}) AS w FROM documents),
tf AS (SELECT doc_id, w, CAST(COUNT(*) AS BIGINT) AS tf FROM toks
       GROUP BY 1, 2),
n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents),
df AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY 1),
idx AS (SELECT tf.doc_id, tf.w, tf.tf, (n.n_docs * 100) // df.df AS idf_s
        FROM tf JOIN df USING (w), n
        WHERE df.df * 10 <= n.n_docs * 9),
q AS (SELECT doc_id AS qdoc, w, tf AS qtf, idf_s AS qidf
      FROM idx WHERE doc_id % 97 = 0),
scores AS (SELECT q.qdoc, idx.doc_id AS cand,
                  CAST(SUM(q.qtf * idx.tf * q.qidf) AS BIGINT) AS score
           FROM q JOIN idx USING (w)
           WHERE idx.doc_id <> q.qdoc
           GROUP BY 1, 2),
ranked AS (SELECT qdoc, cand, score,
                  CAST(ROW_NUMBER() OVER (PARTITION BY qdoc
                       ORDER BY score DESC, cand) AS BIGINT) AS rank
           FROM scores)
SELECT qdoc, rank, cand, score FROM ranked WHERE rank <= 3
"""


def docs_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 retrieval top-k -- THE lexical ranking function (Okapi
    BM25, k1=1.2, b=0.75) beside the plain tf-idf twin: per query doc
    (doc_id % 97 == 0) the 3 best candidates by the saturating,
    length-normalized score, via the same inverted-index equi-join --
    never all-pairs.

    Integer-exact so the oracle hashes bit-for-bit: with avgdl
    quantized to DLSUM DIV N, the per-term BM25 weight
        idf * tf*(k1+1) / (tf + k1*(1 - b + b*dl/avgdl))
    becomes the rational
        idf_s * tf * 44 * avgdl / (20*tf*avgdl + 6*avgdl + 18*dl)
    (k1=6/5, b=3/4 cleared of denominators), emitted through one
    truncating DIV at x10^4 fixed point and summed as BIGINT. idf_s is
    the same rational (N*100) DIV df surrogate the tf-idf ops use
    (monotone in the log idf). Bound: at N=1e6 docs the per-term
    numerator stays ~1e16 inside int64; past ~1e9 docs idf_s must lift
    to DECIMAL(38,0) or bucket into idf classes (documented, same
    family as the covariance row bound).

    Scale shape: identical to docs_tfidf_topk -- df-capped postings
    (the Zipf-head stopword cap), broadcast query postings, one
    (qdoc, cand) hash agg; dl/avgdl are one extra doc-grain aggregate
    and a 2-scalar broadcast."""
    from pyspark.sql import Window as W

    docs = _docs(spark, sf_dir)
    toks = docs.select("doc_id", F.explode(T.tokens(F.col("text"))).alias("w"))
    tf = toks.groupBy("doc_id", "w").agg(F.count(F.lit(1)).alias("tf"))
    dl = tf.groupBy("doc_id").agg(F.sum("tf").alias("dl"))
    df_ = tf.groupBy("w").agg(F.count(F.lit(1)).alias("df"))
    n_docs = docs.count()          # bounded scalar (tfidf precedent)
    dlsum = dl.agg(F.sum("dl")).collect()[0][0]  # second bounded scalar
    avgdl = int(dlsum) // int(n_docs)
    idx = (tf.join(df_, "w").join(dl, "doc_id")
           .filter(F.col("df") * 10 <= F.lit(int(n_docs)) * 9)
           .withColumn("idf_s",
                       F.expr(f"CAST({int(n_docs) * 100} DIV df AS BIGINT)")))
    q = (idx.select(F.col("doc_id").alias("qdoc"), "w")
         .filter(F.col("qdoc") % 97 == 0))
    term_score = F.expr(
        f"(idf_s * tf * 44 * {avgdl} * 10000) DIV "
        f"(20 * tf * {avgdl} + 6 * {avgdl} + 18 * dl)")
    scores = (idx.join(F.broadcast(q), "w")
              .filter(F.col("doc_id") != F.col("qdoc"))
              .groupBy("qdoc", F.col("doc_id").alias("cand"))
              .agg(F.sum(term_score).alias("score")))
    rk = W.partitionBy("qdoc").orderBy(F.desc("score"), F.asc("cand"))
    return (scores.withColumn("rank", F.row_number().over(rk).cast("long"))
            .filter(F.col("rank") <= 3)
            .select("qdoc", "rank", "cand", "score"))


DOCS_BM25_TOPK_SQL = rf"""
WITH toks AS (SELECT doc_id, unnest({_DUCK_TOKENS}) AS w FROM documents),
tf AS (SELECT doc_id, w, CAST(COUNT(*) AS BIGINT) AS tf FROM toks
       GROUP BY 1, 2),
dl AS (SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS dl FROM tf GROUP BY 1),
n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents),
ad AS (SELECT CAST((SELECT SUM(dl) FROM dl) // n_docs AS BIGINT) AS avgdl
       FROM n),
df AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY 1),
idx AS (SELECT tf.doc_id, tf.w, tf.tf, dl.dl,
               (n.n_docs * 100) // df.df AS idf_s
        FROM tf JOIN df USING (w) JOIN dl USING (doc_id), n
        WHERE df.df * 10 <= n.n_docs * 9),
q AS (SELECT doc_id AS qdoc, w FROM idx WHERE doc_id % 97 = 0),
scores AS (SELECT q.qdoc, idx.doc_id AS cand,
                  CAST(SUM((idx.idf_s * idx.tf * 44 * ad.avgdl * 10000)
                           // (20 * idx.tf * ad.avgdl + 6 * ad.avgdl
                               + 18 * idx.dl)) AS BIGINT) AS score
           FROM q JOIN idx USING (w), ad
           WHERE idx.doc_id <> q.qdoc
           GROUP BY 1, 2),
ranked AS (SELECT qdoc, cand, score,
                  CAST(ROW_NUMBER() OVER (PARTITION BY qdoc
                       ORDER BY score DESC, cand) AS BIGINT) AS rank
           FROM scores)
SELECT qdoc, rank, cand, score FROM ranked WHERE rank <= 3
"""


# --- BPE encoding (apply the learned merges) --------------------------------

BPE_ENCODE_ROUNDS = 4


def docs_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE ENCODING -- the other half of the tokenizer beside
    docs_bpe_merges' training: learn 4 merges from the corpus word-freq
    table, then apply them in rank order to every document and report
    per-doc BPE token counts (the number every packing/budgeting op
    downstream actually consumes).

    The apply step is pure string algebra, no UDF: symbols carry a '|'
    terminator and every replace pattern is anchored by a leading
    space, so a pattern can only match whole symbols at symbol
    boundaries (mid-symbol prefixes like 'a' inside 'ab|' cannot match
    ' a|'), and one non-overlapping left-to-right replace per rank IS
    exhaustive greedy BPE for that rank (consecutive disjoint pairs
    don't share boundary characters: ' a| a| a| a|' merges both pairs
    in one pass, and the odd run leaves the leftmost-greedy remainder).

    Scale shape: training iterates on the vocab-bounded (spaced, freq)
    table (one corpus pass builds it); each learned merge applies via a
    one-row broadcast; ENCODING also touches only the distinct-word
    vocab -- documents join the encoded vocab by word, so corpus rows
    are never string-rewritten, the 100 TB tokenizer shape."""
    docs = _docs(spark, sf_dir)
    toks = docs.select("doc_id",
                       F.explode(T.tokens(F.col("text"))).alias("w"))
    wf = toks.groupBy("w").agg(F.count(F.lit(1)).alias("freq"))
    spaced = F.expr(r"trim(regexp_replace(w, '(.)', '$1\\| '))")
    train = (wf.filter(F.length("w") >= 2)
             .select(spaced.alias("spaced"), "freq"))

    apply_merge = ("substr(replace(' ' || spaced, ' ' || ma || ' ' || mb,"
                   " ' ' || replace(ma, '|', '') || mb), 2)")
    merges = []
    cur = train
    for _ in range(BPE_ENCODE_ROUNDS):
        pairs = _bpe_pair_counts(cur)
        top = (pairs.orderBy(F.desc("pair_count"), "a", "b").limit(1)
               .select(F.col("a").alias("ma"), F.col("b").alias("mb")))
        cur = (cur.crossJoin(F.broadcast(top))
               .select(F.expr(apply_merge).alias("spaced"), "freq"))
        merges.append(top)

    enc = wf.select("w", "freq", spaced.alias("spaced"))
    for top in merges:
        enc = (enc.crossJoin(F.broadcast(top))
               .select("w", "freq", F.expr(apply_merge).alias("spaced")))
    enc = enc.select(
        "w", (F.length("spaced")
              - F.length(F.expr("replace(spaced, '|', '')"))).alias("n_sym"))

    return (toks.join(enc, "w")
            .groupBy("doc_id")
            .agg(F.count(F.lit(1)).alias("n_words"),
                 F.sum(F.length("w")).alias("n_word_chars"),
                 F.sum("n_sym").alias("n_bpe"))
            .select("doc_id", "n_words", "n_word_chars", "n_bpe",
                    (F.col("n_bpe").cast("double") / F.col("n_word_chars"))
                    .alias("tokens_per_char")))


def _bpe_encode_sql(rounds: int = BPE_ENCODE_ROUNDS) -> str:
    apply = ("substr(replace(' ' || spaced, ' ' || t.a || ' ' || t.b,"
             " ' ' || replace(t.a, '|', '') || t.b), 2)")
    parts = [rf"""
WITH toks AS (SELECT doc_id, unnest({_DUCK_TOKENS}) AS w FROM documents),
wf AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS freq FROM toks GROUP BY 1),
sp0 AS (SELECT trim(regexp_replace(w, '(.)', '\1| ', 'g')) AS spaced, freq
        FROM wf WHERE length(w) >= 2)"""]
    for k in range(1, rounds + 1):
        parts.append(f""",
p{k} AS ({_DUCK_BPE_PAIRS % f'sp{k - 1}'}),
top{k} AS (SELECT a, b FROM p{k} ORDER BY pair_count DESC, a, b LIMIT 1),
sp{k} AS (SELECT {apply} AS spaced, freq FROM sp{k - 1}, top{k} t)""")
    enc_chain = []
    for k in range(1, rounds + 1):
        enc_chain.append(f""",
enc{k} AS (SELECT w, {apply} AS spaced FROM enc{k - 1}, top{k} t)""")
    parts.append(rf""",
enc0 AS (SELECT w, trim(regexp_replace(w, '(.)', '\1| ', 'g')) AS spaced
         FROM wf){"".join(enc_chain)},
nsym AS (SELECT w, CAST(length(spaced)
                        - length(replace(spaced, '|', '')) AS BIGINT)
                   AS n_sym
         FROM enc{rounds})
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_words,
       CAST(SUM(length(w)) AS BIGINT) AS n_word_chars,
       CAST(SUM(n_sym) AS BIGINT) AS n_bpe,
       CAST(SUM(n_sym) AS DOUBLE) / SUM(length(w)) AS tokens_per_char
FROM toks JOIN nsym USING (w)
GROUP BY 1""")
    return "".join(parts)


DOCS_BPE_ENCODE_SQL = _bpe_encode_sql()


# --- BPE training harness (production merge counts) -------------------------

BPE_TRAIN_ROUNDS = 16


def bpe_train(spark: SparkSession, sf_dir: str,
              rounds: int = BPE_TRAIN_ROUNDS,
              round_seconds: list[float] | None = None) -> DataFrame:
    """Sequential BPE merge training at PRODUCTION shape: `rounds` is a
    parameter (a real tokenizer runs thousands), and per-round cost is
    kept FLAT by localCheckpoint-ing the vocab table after every merge
    -- without it each round's crossJoin stacks onto an ever-growing
    unresolved plan and Catalyst analysis cost compounds per round (the
    round-4 demo ran 4 rounds for exactly that reason; the runtime pin
    in tests/test_bpe_scaling.py certifies ~linear growth now).

    Dataflow per round, all vocab-bounded (corpus rows are touched
    exactly once, by the word-frequency pass):
      1. hash-agg adjacent-symbol pair counts over (spaced, freq);
      2. pick the winner by (count DESC, a, b) -- a total order, so
         training is deterministic on any cluster;
      3. rewrite the vocab's spaced form via a one-row broadcast (the
         '|' terminator scheme from docs_bpe_encode keeps multi-char
         symbol boundaries unambiguous);
      4. localCheckpoint: truncate lineage so round N+1's plan is the
         same size as round 1's.

    Returns one row per learned merge: (step, a, b, pair_count).
    `round_seconds`, when given, receives per-round wall times (the
    scaling test's probe). At 100 TB the per-round jobs scan only the
    distinct-word table -- merge count scales by adding ROUNDS, not
    corpus passes, which is why real BPE trainers survive web-scale
    corpora."""
    import time

    docs = _docs(spark, sf_dir)
    toks = docs.select(F.explode(T.tokens(F.col("text"))).alias("w"))
    wf = toks.groupBy("w").agg(F.count(F.lit(1)).alias("freq"))
    spaced = F.expr(r"trim(regexp_replace(w, '(.)', '$1\\| '))")
    # the ONLY corpus-bounded job: materialize the vocab table once
    cur = (wf.filter(F.length("w") >= 2)
           .select(spaced.alias("spaced"), "freq")
           .localCheckpoint())
    apply_merge = ("substr(replace(' ' || spaced, ' ' || ma || ' ' || mb,"
                   " ' ' || replace(ma, '|', '') || mb), 2)")
    merge_rows: list[DataFrame] = []
    for step in range(1, rounds + 1):
        t0 = time.perf_counter()
        top = (_bpe_pair_counts(cur)
               .orderBy(F.desc("pair_count"), "a", "b").limit(1)
               .select(F.lit(step).cast("long").alias("step"),
                       F.col("a"), F.col("b"), "pair_count")
               .localCheckpoint())  # 1 row; avoids recomputing for output
        cur = (cur.crossJoin(F.broadcast(
                   top.select(F.col("a").alias("ma"),
                              F.col("b").alias("mb"))))
               .select(F.expr(apply_merge).alias("spaced"), "freq")
               .localCheckpoint())
        merge_rows.append(top)
        if round_seconds is not None:
            round_seconds.append(time.perf_counter() - t0)
    out = merge_rows[0]
    for frame in merge_rows[1:]:
        out = out.unionAll(frame)
    return out


def docs_bpe_train16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The gated production-harness variant: 16 sequential merges (4x
    the algorithm demo in docs_bpe_merges), exact vs a 16-round unrolled
    DuckDB CTE chain."""
    return bpe_train(spark, sf_dir, rounds=BPE_TRAIN_ROUNDS)


def _bpe_train_sql(rounds: int = BPE_TRAIN_ROUNDS) -> str:
    # sp{k} is referenced twice per later round (pair counting + the
    # merge rewrite); DuckDB inlines CTEs by default, so an UNMARKED
    # 16-round chain expands to 2^16 scans of the corpus ("too many open
    # files" long before it finishes). MATERIALIZED pins each round to
    # one evaluation -- the oracle analog of the Spark side's
    # localCheckpoint per round.
    apply = ("substr(replace(' ' || spaced, ' ' || t.a || ' ' || t.b,"
             " ' ' || replace(t.a, '|', '') || t.b), 2)")
    parts = [rf"""
WITH toks AS (SELECT unnest({_DUCK_TOKENS}) AS w FROM documents),
wf AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS freq FROM toks GROUP BY 1),
sp0 AS MATERIALIZED (
  SELECT trim(regexp_replace(w, '(.)', '\1| ', 'g')) AS spaced, freq
  FROM wf WHERE length(w) >= 2)"""]
    for k in range(1, rounds + 1):
        parts.append(f""",
p{k} AS ({_DUCK_BPE_PAIRS % f'sp{k - 1}'}),
top{k} AS MATERIALIZED (SELECT a, b, pair_count FROM p{k}
           ORDER BY pair_count DESC, a, b LIMIT 1),
sp{k} AS MATERIALIZED (
  SELECT {apply} AS spaced, freq FROM sp{k - 1}, top{k} t)""")
    selects = [f"SELECT CAST({k} AS BIGINT) AS step, a, b, pair_count "
               f"FROM top{k}" for k in range(1, rounds + 1)]
    parts.append("\n" + "\nUNION ALL\n".join(selects))
    return "".join(parts)


DOCS_BPE_TRAIN16_SQL = _bpe_train_sql()


# --- Novelty scoring (curation signal) --------------------------------------

def docs_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-order novelty score: the fraction of each document's
    DISTINCT word trigrams that no EARLIER document (doc_id order -- the
    ingest order proxy) has contributed -- the curation signal behind
    diversity-aware data mixing, where late near-copies of early content
    score near zero. One shuffle computes each shingle's FIRST bearer
    (min doc_id -- partial-aggregatable), and a doc's novel count is the
    number of shingles it is the first bearer of; no pairwise doc
    comparison anywhere, so the plan is two hash aggregations at any
    corpus size."""
    docs = _docs(spark, sf_dir)
    sh = docs.select(
        "doc_id", F.explode(T.shingles(T.tokens(F.col("text"))))
        .alias("shingle"))
    first = sh.groupBy("shingle").agg(F.min("doc_id").alias("first_doc"))
    per_doc = sh.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_shingles"))
    novel = (first.groupBy(F.col("first_doc").alias("doc_id"))
             .agg(F.count(F.lit(1)).alias("n_novel")))
    return (per_doc.join(novel, "doc_id", "left")
            .select("doc_id", "n_shingles",
                    F.coalesce("n_novel", F.lit(0)).alias("n_novel"),
                    (F.coalesce("n_novel", F.lit(0)).cast("double")
                     / F.col("n_shingles")).alias("novelty")))


DOCS_NOVELTY_SQL = rf"""
WITH t AS (SELECT doc_id, {_DUCK_TOKENS} AS arr FROM documents),
n AS (SELECT doc_id, len(arr) AS n_tokens, arr FROM t),
sh AS (
  SELECT DISTINCT doc_id, array_to_string(arr[s+1:s+3], ' ') AS shingle
  FROM (SELECT doc_id, arr, unnest(range(0, n_tokens - 2)) AS s
        FROM n WHERE n_tokens >= 3) st),
per_doc AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_shingles
            FROM sh GROUP BY 1),
first AS (SELECT shingle, MIN(doc_id) AS first_doc FROM sh GROUP BY 1),
novel AS (SELECT first_doc AS doc_id, CAST(COUNT(*) AS BIGINT) AS n_novel
          FROM first GROUP BY 1)
SELECT p.doc_id, p.n_shingles,
       CAST(COALESCE(v.n_novel, 0) AS BIGINT) AS n_novel,
       CAST(COALESCE(v.n_novel, 0) AS DOUBLE) / p.n_shingles AS novelty
FROM per_doc p LEFT JOIN novel v USING (doc_id)
"""
