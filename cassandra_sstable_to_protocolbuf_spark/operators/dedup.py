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

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from cassandra_sstable_to_protocolbuf_spark.operators.text import fingerprint, shingles, tokens
from cassandra_sstable_to_protocolbuf_spark.session import pin

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
    # cache the exploded (doc, shingle) rows: they feed the hot-shingle
    # scan, the per-doc counts, and BOTH inverted-index join sides, and
    # the tokenize+shingle chain would otherwise re-run for each (the
    # downstream anti-join stays a narrow broadcast over the cached
    # rows). MEMORY_AND_DISK spills; at real scale this materializes to
    # storage instead.
    sh = pin(doc_shingles(docs, text_col, id_col, n))
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


def prefix_filter_pairs(docs: DataFrame, threshold_pct: int = 60,
                        text_col: str = "text", id_col: str = "doc_id",
                        n: int = 3) -> DataFrame:
    """Exact set-similarity join by PREFIX FILTERING (the PPJoin family,
    Xiao et al.): order every document's shingles by ascending global
    document frequency (rarest first, shingle text as the tie-break so
    the canonical order is total and identical everywhere), keep only
    each doc's first |d| - ceil(t*|d|) + 1 shingles as its prefix, and
    generate candidates ONLY from prefix-prefix shingle matches -- any
    pair with Jaccard >= t provably shares a prefix shingle, so exact
    verification of the candidates returns the complete answer.

    This replaces the hot-shingle df CAP (ngram_jaccard_pairs) with a
    principled bound: hot shingles sort LAST in every doc, so they fall
    outside prefixes and never explode the inverted index -- no recall
    caveat, no tuning constant, same exact-output guarantee as brute
    force. Cost: one df aggregation + a prefix-sized index join (a
    t=0.6 prefix is ~40% of each doc's shingles, concentrated in rare
    =low-fanout postings). threshold_pct is integer basis so the prefix
    length ceil() stays in exact integer arithmetic.

    Scale: df agg and prefix ranking are one shuffle on shingle + one
    on doc; the candidate join hashes on (rare) prefix shingles;
    verification joins only candidate pairs. At 100 TB the Zipf head
    that would break a naive index join is structurally excluded."""
    t_num, t_den = threshold_pct, 100
    sh = pin(doc_shingles(docs, text_col, id_col, n))
    sdf = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
    w_doc = Window.partitionBy("doc_id").orderBy("df", "shingle")
    ranked = (sh.join(sdf, "shingle")
              .withColumn("pos", F.row_number().over(w_doc))
              .withColumn("sz", F.count(F.lit(1)).over(
                  Window.partitionBy("doc_id"))))
    # prefix length |d| - ceil(t*|d|) + 1, ceil in exact integers
    plen = (F.col("sz")
            - ((F.col("sz") * t_num + t_den - 1)
               / t_den).cast("long") + 1)
    prefix = ranked.filter(F.col("pos") <= plen).select("doc_id", "shingle")
    cands = (prefix.alias("a").join(
        prefix.alias("b"), F.col("a.shingle") == F.col("b.shingle"))
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(F.col("a.doc_id").alias("d1"),
                F.col("b.doc_id").alias("d2")).distinct())
    s1 = sh.select(F.col("doc_id").alias("d1"), "shingle")
    s2 = sh.select(F.col("doc_id").alias("d2"), "shingle")
    common = (cands.join(s1, "d1").join(s2, ["d2", "shingle"])
              .groupBy("d1", "d2").agg(F.count(F.lit(1)).alias("n_common")))
    counts = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("c"))
    c1 = counts.select(F.col("doc_id").alias("d1"), F.col("c").alias("c1"))
    c2 = counts.select(F.col("doc_id").alias("d2"), F.col("c").alias("c2"))
    union_sz = F.col("c1") + F.col("c2") - F.col("n_common")
    return (common.join(c1, "d1").join(c2, "d2")
            # integer threshold: J >= t  <=>  den*common >= num*union
            .filter(F.col("n_common") * t_den >= union_sz * t_num)
            .select("d1", "d2", "n_common", union_sz.alias("n_union"),
                    (F.col("n_common").cast("double")
                     / union_sz.cast("double")).alias("jaccard")))


MINHASH_PRIME = (1 << 31) - 1  # Mersenne: a*c+b stays within int64
MINHASH_BANDS = 21
MINHASH_ROWS = 3  # 63 hashes; P(candidate | j=0.5) = 1-(1-0.125)^21 ~ 0.94


def minhash_params(seed: int, num_hashes: int) -> list[tuple[int, int]]:
    """Deterministic (a, b) coefficients for h_j(c) = (a*c + b) mod P --
    the same literals are embedded in the DuckDB oracle, so minhash
    signatures (pure int64 arithmetic over md5-derived shingle codes)
    are identical across engines."""
    import random

    rng = random.Random(seed)
    return [(rng.randrange(1, MINHASH_PRIME), rng.randrange(0, MINHASH_PRIME))
            for _ in range(num_hashes)]


def minhash_lsh_pairs(docs: DataFrame, threshold: float = 0.5,
                      text_col: str = "text", id_col: str = "doc_id",
                      n_bands: int = MINHASH_BANDS, n_rows: int = MINHASH_ROWS,
                      seed: int = 42) -> DataFrame:
    """Approximate near-dup pairs via hand-rolled banded MinHash, then
    exact-Jaccard verify.

    Shingle codes are the md5-60-bit trick (same as SimHash) reduced mod
    a Mersenne prime; each of the n_bands*n_rows permutation hashes is a
    universal (a*c+b) mod P with seeded literal coefficients. Candidate
    pairs come from an equi-join on (band, r-row signature) -- linear
    scale, like Spark ML's approxSimilarityJoin -- but fully
    deterministic, so the whole operator has an exact DuckDB oracle.
    Every candidate is re-checked with exact Jaccard: precision is 1.0,
    recall is the banded s-curve (1-(1-t^r)^b ~ 0.94 at t=0.5).
    """
    from cassandra_sstable_to_protocolbuf_spark.session import (
        tune_for_hof_explode, widen)

    # exploding a lambda-built shingle array: InferFiltersFromGenerate
    # would clone the whole tokenize+shingle chain into a pre-explode
    # Filter (interpreted, no CSE) -- same trap as doc_shingles
    tune_for_hof_explode(docs.sparkSession)
    num_hashes = n_bands * n_rows
    params = minhash_params(seed, num_hashes)
    # tokens materialize in their own projection first: the shingle
    # lambda references them O(doc_len) times and interpreted HOFs
    # re-evaluate inlined expressions per reference
    toks = widen(docs).select(F.col(id_col).alias("doc_id"),
                              tokens(F.col(text_col)).alias("t"))
    # no size(sh) > 0 filter: predicate pushdown would substitute the
    # shingle lambda into a pre-projection Filter and evaluate it twice;
    # explode drops empty arrays and shingle-less docs can't be
    # candidates anyway
    # cache: the shingle arrays feed the signature explode AND both
    # sides of the exact-Jaccard verify join -- without it the
    # tokenize+shingle chain re-runs per consumer. One row per doc;
    # MEMORY_AND_DISK spills gracefully when a corpus outgrows memory
    # (at real scale you'd checkpoint this to storage instead).
    base = pin(toks.select("doc_id", shingles(F.col("t")).alias("sh")))
    # explode + codegen'd hash aggregation, NOT 63 interpreted HOF
    # transforms over the shingle array: each md5 code is computed ONCE
    # per (doc, shingle) row and all permutation mins run as JVM
    # aggregates with map-side partial agg (measured 30s -> ~2s at
    # sf0.1). Also the shape that scales: narrow explode, one shuffle
    # keyed by doc_id.
    code = (F.conv(F.substring(F.md5("shingle"), 1, 15), 16, 10)
            .cast("long") % MINHASH_PRIME)
    coded = (base.select("doc_id", F.explode("sh").alias("shingle"))
             .select("doc_id", code.alias("c")))
    mins = coded.groupBy("doc_id").agg(*[
        F.min((a * F.col("c") + b) % MINHASH_PRIME).alias(f"h{j}")
        for j, (a, b) in enumerate(params)])
    bands = F.array(*[
        F.concat_ws(",", *[F.col(f"h{t * n_rows + r}").cast("string")
                           for r in range(n_rows)])
        for t in range(n_bands)])
    # cache: both band self-join sides read the signatures (AQE's
    # broadcast defeats ReusedExchange, same as simhash_pairs)
    mins = pin(mins)
    ex = mins.select("doc_id", F.posexplode(bands).alias("band", "bsig"))
    a_side = ex.select("band", "bsig", F.col("doc_id").alias("d1"))
    b_side = ex.select("band", "bsig", F.col("doc_id").alias("d2"))
    cand = (a_side.join(b_side, ["band", "bsig"])
            .filter(F.col("d1") < F.col("d2"))
            .select("d1", "d2").dropDuplicates(["d1", "d2"]))
    sh1 = base.select(F.col("doc_id").alias("d1"), F.col("sh").alias("sh1"))
    sh2 = base.select(F.col("doc_id").alias("d2"), F.col("sh").alias("sh2"))
    n_common = F.size(F.array_intersect("sh1", "sh2"))
    jacc = (n_common.cast("double")
            / (F.size("sh1") + F.size("sh2") - n_common).cast("double"))
    return (cand.join(sh1, "d1").join(sh2, "d2")
            .select("d1", "d2", jacc.alias("jaccard"))
            .filter(F.col("jaccard") >= threshold))


def minhash_lsh_oracle_sql(threshold: float = 0.5,
                           n_bands: int = MINHASH_BANDS,
                           n_rows: int = MINHASH_ROWS,
                           seed: int = 42) -> str:
    """DuckDB oracle for minhash_lsh_pairs: identical shingle codes
    (md5 60-bit mod P), identical literal (a, b) coefficients, identical
    banding and exact-Jaccard verify."""
    params = minhash_params(seed, n_bands * n_rows)
    P = MINHASH_PRIME
    mh = ", ".join(
        f"list_min(list_transform(codes, c -> ({a} * c + {b}) % {P})) AS h{j}"
        for j, (a, b) in enumerate(params))
    band_rows = "\nUNION ALL\n".join(
        "SELECT doc_id, {t} AS band, {sig} AS bsig FROM mh".format(
            t=t, sig=" || ',' || ".join(
                f"CAST(h{t * n_rows + r} AS VARCHAR)" for r in range(n_rows)))
        for t in range(n_bands))
    return rf"""
WITH toks AS (SELECT doc_id,
                     list_filter(regexp_split_to_array(lower(text), '\s+'),
                                 x -> x <> '') AS t
              FROM documents),
sh AS (SELECT doc_id, list_distinct(
          CASE WHEN len(t) >= 3
               THEN list_transform(range(1, len(t) - 1),
                                   i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])
               ELSE [] END) AS sh
       FROM toks),
coded AS (SELECT doc_id, sh,
                 list_transform(sh, s ->
                     CAST(('0x' || substring(md5(s), 1, 15)) AS BIGINT) % {P})
                 AS codes
          FROM sh WHERE len(sh) > 0),
mh AS (SELECT doc_id, sh, {mh} FROM coded),
bands AS ({band_rows}),
cand AS (SELECT DISTINCT a.doc_id AS d1, b.doc_id AS d2
         FROM bands a JOIN bands b
           ON a.band = b.band AND a.bsig = b.bsig AND a.doc_id < b.doc_id)
SELECT d1, d2, jaccard FROM (
  SELECT d1, d2,
         CAST(len(list_filter(m1.sh, x -> list_contains(m2.sh, x))) AS DOUBLE)
         / CAST(len(m1.sh) + len(m2.sh)
                - len(list_filter(m1.sh, x -> list_contains(m2.sh, x)))
                AS DOUBLE) AS jaccard
  FROM cand JOIN mh m1 ON m1.doc_id = cand.d1
            JOIN mh m2 ON m2.doc_id = cand.d2
) WHERE jaccard >= {threshold}
"""


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
    # cache: both sides of the band self-join read the signatures, and
    # AQE broadcasts one side, which defeats ReusedExchange -- without
    # the cache the whole explode+60-aggregate signature stage runs
    # twice. One signature row per doc, so the cache is tiny even at
    # corpus scale (n_docs x 16 bytes).
    sh = pin(simhash(docs, text_col, id_col))
    return _simhash_band_pairs(sh, max_hamming)


def _simhash_band_pairs(sh: DataFrame, max_hamming: int) -> DataFrame:
    """Banded self-join over a (doc_id, simhash) frame -> exact pairs
    within `max_hamming` (the join/verify core of simhash_pairs)."""
    n_bands = max_hamming + 1
    if n_bands > SIMHASH_BITS:
        raise ValueError("max_hamming must be < SIMHASH_BITS")
    base = SIMHASH_BITS // n_bands
    extra = SIMHASH_BITS % n_bands  # first `extra` bands get one more bit
    # single posexplode of the band-value array, NOT a union of per-band
    # selects: the union form re-evaluated the whole simhash aggregation
    # once per band per join side
    band_vals = []
    offset = 0
    for b in range(n_bands):
        width = base + (1 if b < extra else 0)
        band_vals.append(F.shiftright("simhash", offset)
                         .bitwiseAND(F.lit((1 << width) - 1)))
        offset += width
    banded = sh.select("doc_id", "simhash",
                       F.posexplode(F.array(*band_vals)).alias("band", "band_val"))
    a = banded.select(F.col("doc_id").alias("d1"), F.col("simhash").alias("h1"),
                      "band", "band_val")
    b_ = banded.select(F.col("doc_id").alias("d2"), F.col("simhash").alias("h2"),
                       "band", "band_val")
    # hamming-filter BEFORE the distinct: the xor/bit_count is a cheap
    # per-row map, so the dedup shuffle carries only surviving pairs
    # (3 narrow columns) instead of every band collision with both hashes
    hamming = F.bit_count(F.col("h1").bitwiseXOR(F.col("h2")))
    return (a.join(b_, ["band", "band_val"])
            .filter(F.col("d1") < F.col("d2"))
            .select("d1", "d2", hamming.alias("hamming"))
            .filter(F.col("hamming") <= max_hamming)
            .distinct())


def simhash_components(docs: DataFrame, max_hamming: int = 3,
                       text_col: str = "text",
                       id_col: str = "doc_id") -> DataFrame:
    """(node, cluster_id) for EVERY doc, over the SimHash near-dup pair
    graph -- identical to connected_components(simhash_pairs(docs)) but
    with the identical-signature collapse.

    Docs sharing an exact signature are mutual hamming-0 near-dups, and a
    signature's band buckets (hence its candidate edges) depend only on
    the hash value -- so one representative (min doc_id) per DISTINCT
    signature stands in for its whole group: cluster the representative
    graph, then broadcast labels back through the signature. Identical-
    content groups are the dominant shape in real corpus dumps and
    produce k^2 pairs for k copies; the collapse cuts that to one node
    (measured 271k -> 13.5k edges on the sf0.1 documents). Component
    minima are preserved exactly: a component's smallest doc_id is itself
    the representative of its signature group, so the propagated label
    equals the pair-graph label doc for doc.
    """
    # simhash() canonicalizes the id column to 'doc_id' internally
    sh = pin(simhash(docs, text_col, id_col))
    rep = sh.groupBy("simhash").agg(F.min("doc_id").alias("rep_id"))
    rep_pairs = _simhash_band_pairs(
        rep.select(F.col("rep_id").alias("doc_id"), "simhash"), max_hamming)
    rep_lbl = connected_components(rep_pairs, "d1", "d2")
    members = sh.join(rep, "simhash").select("doc_id", "rep_id")
    return (members
            .join(rep_lbl, members.rep_id == rep_lbl.node, "left")
            .select(F.col("doc_id").alias("node"),
                    F.coalesce("cluster_id", "rep_id").alias("cluster_id")))


def connected_components(edges: DataFrame, src: str = "d1", dst: str = "d2",
                         max_iter: int = 25,
                         small_graph_rows: int = 2_000_000) -> DataFrame:
    """Connected components over an undirected edge list by min-label
    propagation: every node's label converges to the smallest node id in
    its component. Returns (node, cluster_id).

    This is the step a keep-one-per-cluster dedup policy needs between
    "near-dup PAIRS" (simhash/minhash output) and "drop all but one doc
    per GROUP": pairs (a,b),(b,c) must collapse into one {a,b,c} cluster.

    Scale design: each round HOOKS (take the min label over graph
    neighbors, one shuffle join + hash agg) then JUMPS (pointer-jump to
    the label's own label, one more shuffle join) -- the jump halves
    remaining path lengths, so rounds = O(log diameter) instead of
    O(diameter) (duplicate chains A~B~C~... make real dedup graphs
    deeper than they look; cf. Kiveris et al., "Connected Components in
    MapReduce and Beyond"). Labels initialize to min(node, neighbors),
    folding the first hook into the init aggregation.
    localCheckpoint() truncates the plan each round so lineage (and
    Catalyst analysis time) stays O(1) instead of O(rounds).
    """
    # Materialize the edge list ONCE: without this, every propagation
    # round's join re-executes the upstream pair mining (simhash banding
    # + hamming verify), turning an O(rounds) loop into O(rounds x mine).
    sym = (edges.select(F.col(src).alias("node"), F.col(dst).alias("nbr"))
           .union(edges.select(F.col(dst).alias("node"), F.col(src).alias("nbr")))
           .localCheckpoint())
    # Size-adaptive strategy (the AQE move, applied to graph clustering):
    # each distributed round costs fixed scheduler/shuffle latency, so on
    # a small edge set O(log d) rounds are pure overhead. Below the
    # threshold -- edges ALREADY materialized, so the count is free --
    # a driver-side union-find answers in well under a second: 2M rows
    # stream via toLocalIterator and the parent dict peaks around a
    # hundred MB (Python dict slots + boxed ints are ~100 bytes/entry,
    # which is what bounds the threshold, NOT the raw 16 B/edge).
    # Above it, the distributed loop proceeds; at 100 TB the collapse in
    # simhash_components typically brings the representative graph UNDER
    # the threshold, which is exactly why the collapse exists. Results
    # are identical: min node id per component.
    if sym.count() <= small_graph_rows:
        return _driver_union_find(edges.sparkSession, sym)
    labels = (sym.groupBy("node")
              .agg(F.least(F.col("node"), F.min("nbr")).alias("lbl"))
              .localCheckpoint())
    for _ in range(max_iter):
        # HOOK: min label over graph neighbors
        nbr_min = (sym.join(labels.withColumnRenamed("node", "nbr"), "nbr")
                   .groupBy("node").agg(F.min("lbl").alias("nbr_lbl")))
        hooked = (labels.join(nbr_min, "node", "left")
                  .select("node", F.col("lbl").alias("olbl"),
                          F.least("lbl", F.coalesce("nbr_lbl", "lbl"))
                          .alias("lbl")))
        # JUMP: adopt the label's own label (every label IS a node id,
        # so the inner self-join keeps all rows); lbl(lbl(x)) <= lbl(x)
        # by monotonicity, so the jump only ever lowers labels. The
        # convergence flag compares against the round's starting label
        # in the same pass, making the probe a scan of the checkpointed
        # rows, not another join.
        new_labels = (hooked
                      .join(labels.select(F.col("node").alias("lbl"),
                                          F.col("lbl").alias("plbl")), "lbl")
                      .select("node",
                              F.least("lbl", "plbl").alias("lbl"),
                              (F.least("lbl", "plbl") < F.col("olbl"))
                              .alias("chg"))
                      .localCheckpoint())
        changed = new_labels.where("chg").limit(1).count()
        labels = new_labels.drop("chg")
        if changed == 0:
            return labels.select("node", F.col("lbl").alias("cluster_id"))
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} hook+jump "
        f"rounds (handles diameter up to ~2^{max_iter}); raise max_iter")


def _driver_union_find(spark, sym: DataFrame) -> DataFrame:
    """Small-graph fast path for connected_components: collect the
    (already materialized, threshold-bounded) symmetric edge list and
    run path-compressed union-find with min-id roots on the driver."""
    parent: dict = {}

    def find(x):
        r = x
        while parent[r] != r:
            r = parent[r]
        while parent[x] != r:  # path compression
            parent[x], x = r, parent[x]
        return r

    # one collect() job, NOT toLocalIterator(): the iterator fetches
    # partitions sequentially -- one full job submission per partition
    # (~32 of them on this layout, each paying scheduler + Python-runner
    # latency). The edge list is already threshold-bounded (<= 2M rows,
    # checked by the caller), so the collected list is a transient
    # ~200 MB worst case against the same bound that sizes the dict.
    for row in sym.collect():
        a, b = row[0], row[1]
        if a not in parent:
            parent[a] = a
        if b not in parent:
            parent[b] = b
        ra, rb = find(a), find(b)
        if ra != rb:
            # min id wins the root -- the distributed loop's invariant
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    rows = [(n, find(n)) for n in parent]
    schema = sym.select(F.col("node"), F.col("node").alias("cluster_id")).schema
    return spark.createDataFrame(rows, schema)


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
    # SQL-text expressions: the Column-op form of these 60 vote + 60
    # recombine expressions cost ~2.5 s of pure driver/py4j time per
    # call (inside the bench's timed region); one JVM parse each is
    # ~100x cheaper. Semantics identical (same CASE/shift/sum algebra).
    votes = [
        F.expr(f"sum(CASE WHEN (shiftright(h, {b}) & 1) = 1 "
               f"THEN 1 ELSE -1 END)").alias(f"v{b}")
        for b in range(SIMHASH_BITS)
    ]
    agg = tok.groupBy("doc_id").agg(*votes)
    sim = " + ".join(
        f"CASE WHEN v{b} > 0 THEN CAST({1 << b} AS BIGINT) "
        f"ELSE CAST(0 AS BIGINT) END"
        for b in range(SIMHASH_BITS))
    return agg.selectExpr("doc_id",
                          f"CAST(0 AS BIGINT) + {sim} AS simhash")


def shingle_containment_pairs(docs: DataFrame, threshold: float = 0.6,
                              text_col: str = "text", id_col: str = "doc_id",
                              n: int = 3,
                              max_shingle_df: int | None = None) -> DataFrame:
    """DIRECTIONAL near-duplicate pairs by shingle containment:
    containment(d1 -> d2) = |S1 n S2| / |S1|. Asymmetric where Jaccard
    is symmetric -- a short document quoted inside a long one scores
    containment ~1.0 but Jaccard ~|S1|/|S2|, so this is the detector
    for subset/quotation duplication that a Jaccard threshold misses.
    Same inverted-index join shape (and hot-shingle cap) as
    ngram_jaccard_pairs; both directions surface as separate rows."""
    sh = pin(doc_shingles(docs, text_col, id_col, n))
    if max_shingle_df is not None:
        hot = (sh.groupBy("shingle").count()
               .filter(F.col("count") > max_shingle_df).select("shingle"))
        sh = sh.join(hot, "shingle", "left_anti")
    counts = sh.groupBy("doc_id").agg(F.count(F.lit(1)).alias("c"))
    a = sh.select(F.col("doc_id").alias("d1"), "shingle")
    b = sh.select(F.col("doc_id").alias("d2"), "shingle")
    common = (a.join(b, "shingle")
              .filter(F.col("d1") != F.col("d2"))
              .groupBy("d1", "d2")
              .agg(F.count(F.lit(1)).alias("n_common")))
    c1 = counts.select(F.col("doc_id").alias("d1"), F.col("c").alias("c1"))
    containment = F.col("n_common").cast("double") / F.col("c1").cast("double")
    return (common.join(c1, "d1")
            .select("d1", "d2", "n_common", "c1",
                    containment.alias("containment"))
            .filter(F.col("containment") >= threshold))


def _dup_span_cover(docs: DataFrame, k: int, text_col: str, id_col: str):
    """Shared core of the span-dedup pair: returns
    (with_n: doc_id/arr/n_tokens, covered_pos: doc_id/pos) where
    covered_pos holds each DISTINCT token position lying under some
    k-token window that occurs verbatim in another document."""
    from cassandra_sstable_to_protocolbuf_spark.session import (
        tune_for_hof_explode, widen)

    tune_for_hof_explode(docs.sparkSession)
    base = widen(docs).select(F.col(id_col).alias("doc_id"),
                              tokens(F.col(text_col)).alias("arr"))
    with_n = base.select("doc_id", "arr", F.size("arr").alias("n_tokens"))
    starts = F.when(
        F.col("n_tokens") >= k,
        F.sequence(F.lit(0), F.col("n_tokens") - k)
    ).otherwise(F.array().cast("array<int>"))
    sh = (with_n.select("doc_id", "arr", F.explode(starts).alias("s"))
          .select("doc_id", "s",
                  F.concat_ws(" ", F.slice(F.col("arr"), F.col("s") + 1, k))
                  .alias("shingle")))
    dup = (sh.groupBy("shingle")
           .agg(F.count_distinct("doc_id").alias("df"))
           .filter(F.col("df") >= 2)
           .select("shingle"))
    covered_pos = (sh.join(dup, "shingle")
                   .select("doc_id",
                           F.explode(F.sequence(
                               F.col("s"), F.col("s") + k - 1)).alias("pos"))
                   .distinct())
    return with_n, covered_pos


def dup_span_stats(docs: DataFrame, k: int = 8,
                   text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Span-level EXACT-substring duplication audit (the Lee et al. 2022
    'Deduplicating Training Data Makes Language Models Better' shape at
    token-window granularity): a token position is duplicated if any
    k-token window covering it occurs verbatim in ANOTHER document.
    Emits per-doc token counts, duplicated-token counts, and the ratio
    -- the signal span-removal or doc-dropping policies act on. This is
    the detector for copied PASSAGES inside otherwise-distinct documents
    that whole-doc fingerprints (exact dedup) and set-similarity
    (Jaccard/MinHash) both miss.

    Scale shape: one narrow tokenize + window explode (O(corpus
    tokens)), one hash agg to find cross-doc windows, one equi-join of
    window starts against the duplicated set (shuffle join -- the dup
    set is data-proportional, NOT broadcast), and one distinct over
    (doc, position) to union overlapping windows without double
    counting. No all-pairs anywhere; suffix automata are the exotic
    alternative, this is the standard distributed shape.
    """
    with_n, covered_pos = _dup_span_cover(docs, k, text_col, id_col)
    per_doc = with_n.select("doc_id", "n_tokens")
    covered = (covered_pos.groupBy("doc_id")
               .agg(F.count(F.lit(1)).alias("n_dup_tokens")))
    return (per_doc.join(covered, "doc_id", "left")
            .select("doc_id",
                    F.col("n_tokens").cast("long").alias("n_tokens"),
                    F.coalesce("n_dup_tokens", F.lit(0)).cast("long")
                    .alias("n_dup_tokens"),
                    F.when(F.col("n_tokens") > 0,
                           F.coalesce("n_dup_tokens", F.lit(0)).cast("double")
                           / F.col("n_tokens").cast("double"))
                    .otherwise(F.lit(0.0)).alias("dup_ratio")))


def scrub_dup_spans(docs: DataFrame, k: int = 8,
                    text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """The ACTIONABLE half of the span-dedup pair: rewrite each document
    with its duplicated spans REMOVED (tokens under any cross-doc
    k-window dropped, survivors rejoined in original order with single
    spaces). Emits the cleaned text's md5 fingerprint rather than the
    text itself -- gate-friendly, and what a dedup ledger stores anyway.

    Scale shape: the cover computation is shared with dup_span_stats;
    the rebuild posexplodes tokens (O(corpus tokens)), anti-joins the
    covered positions, and reassembles per doc with
    sort_array(collect_list(struct(pos, tok))) -- one extra shuffle on
    doc_id, bounded per-doc state, no all-pairs."""
    with_n, covered_pos = _dup_span_cover(docs, k, text_col, id_col)
    toks = with_n.select(
        "doc_id", F.posexplode("arr").alias("pos", "tok"))
    kept = toks.join(covered_pos, ["doc_id", "pos"], "left_anti")
    rebuilt = (kept.groupBy("doc_id")
               .agg(F.concat_ws(" ", F.transform(
                   F.sort_array(F.collect_list(F.struct("pos", "tok"))),
                   lambda st: st.tok)).alias("scrubbed"),
                    F.count(F.lit(1)).alias("n_kept")))
    return (with_n.select("doc_id", "n_tokens")
            .join(rebuilt, "doc_id", "left")
            .select("doc_id",
                    F.col("n_tokens").cast("long").alias("n_tokens"),
                    F.coalesce("n_kept", F.lit(0)).cast("long")
                    .alias("n_kept"),
                    F.md5(F.coalesce("scrubbed", F.lit("")))
                    .alias("scrubbed_fp")))
