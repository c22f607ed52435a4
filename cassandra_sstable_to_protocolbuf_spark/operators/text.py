"""Text-analysis operators for training-data pipelines: tokenization
stats, quality scoring, language ID (n-gram/stopword heuristic), document
fingerprinting, shingling.

All expressions are built-in pyspark.sql.functions (JVM-side, inside
whole-stage codegen) -- no Python UDFs in any hot path. At 100 TB each of
these is a narrow per-row map over the parquet scan: no shuffle at all.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

EN_STOPWORDS = ("the", "a", "and", "of", "to", "in")

# language -> marker words for the stopword-hit language heuristic
LANG_MARKERS = {
    "en": ("the", "a", "and"),
    "de": ("der", "die", "das", "und"),
    "fr": ("le", "la", "les", "et"),
    "es": ("el", "los", "las", "y"),
}
# deterministic priority order for argmax ties
LANG_PRIORITY = ("en", "de", "fr", "es")


def tokens(text: Column) -> Column:
    """Whitespace tokens of lowercased text, empties removed."""
    return F.filter(F.split(F.lower(text), r"\s+"), lambda x: x != "")


def token_count(text: Column) -> Column:
    return F.size(tokens(text))


# BPE-style pre-tokenization, RE2/Java-portable (no lookaheads): letter
# runs, single digits (Llama-style digit splitting), punctuation runs.
# Alternatives are disjoint char classes, so leftmost-first matching is
# unambiguous across regex engines.
SUBWORD_PATTERN = r"[A-Za-z]+|[0-9]|[^A-Za-z0-9\s]+"


def subword_pieces(text: Column) -> Column:
    """Pre-tokenizer pieces per SUBWORD_PATTERN."""
    return F.regexp_extract_all(text, F.lit(SUBWORD_PATTERN), 0)


def token_budget(docs: DataFrame, text_col: str = "text",
                 id_col: str = "doc_id") -> DataFrame:
    """Per-document token-count estimates for training-budget planning:
    whitespace tokens, BPE-ish pre-tokenizer pieces, and a subword
    estimate (each letter run contributes ceil(len/4) units -- the ~4
    chars/token rule of thumb; digits and punctuation count per piece).
    All integer arithmetic, so the estimate is engine-exact.
    """
    base = docs.select(F.col(id_col).alias("doc_id"),
                       F.col(text_col).alias("_text"),
                       tokens(F.col(text_col)).alias("t"),
                       subword_pieces(F.col(text_col)).alias("p"))
    subword_units = F.aggregate(
        F.transform("p", lambda x: F.floor((F.length(x) + 3) / 4).cast("long")),
        F.lit(0).cast("long"), lambda acc, x: acc + x)
    return base.select(
        "doc_id",
        F.size("t").alias("n_ws_tokens"),
        F.size("p").alias("n_pieces"),
        subword_units.alias("n_subword_est"),
        (F.length("_text").cast("double")
         / F.greatest(subword_units, F.lit(1)).cast("double"))
        .alias("chars_per_token"),
    )


def marker_hits(toks: Column, markers: tuple) -> Column:
    """Count of tokens that are in the marker list (JVM-side lambda)."""
    return F.size(F.filter(toks, lambda x: x.isin(*markers)))


def alpha_chars(text: Column) -> Column:
    return F.length(F.regexp_replace(text, "[^a-zA-Z]", ""))


def normalized(text: Column) -> Column:
    """Whitespace-normalized lowercase form for fingerprinting."""
    return F.regexp_replace(F.lower(F.trim(text)), r"\s+", " ")


def fingerprint(text: Column) -> Column:
    """Deterministic content fingerprint: md5 of the normalized text."""
    return F.md5(normalized(text))


def lang_id(toks: Column) -> Column:
    """Argmax over per-language marker hits, ties broken by LANG_PRIORITY,
    zero hits everywhere -> 'und'."""
    hits = {lang: marker_hits(toks, m) for lang, m in LANG_MARKERS.items()}
    expr = F.lit("und")
    # build the CASE chain in reverse priority so earlier langs win ties
    for lang in reversed(LANG_PRIORITY):
        cond = hits[lang] > 0
        for other in LANG_PRIORITY:
            if LANG_PRIORITY.index(other) < LANG_PRIORITY.index(lang):
                cond = cond & (hits[lang] > hits[other])
            elif other != lang:
                cond = cond & (hits[lang] >= hits[other])
        expr = F.when(cond, F.lit(lang)).otherwise(expr)
    return expr


def shingles(toks: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles (default trigrams)."""
    def make(i: Column) -> Column:
        parts = [F.get(toks, i + k) for k in range(n)]
        return F.concat_ws(" ", *parts)
    return F.when(
        F.size(toks) >= n,
        F.array_distinct(F.transform(F.sequence(F.lit(0), F.size(toks) - n), make)),
    ).otherwise(F.array().cast("array<string>"))


def text_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document token/char statistics.

    Tokens materialize in their own projection first: referencing the
    tokens expression from several output columns would re-run the regex
    split per reference (no subexpression elimination in interpreted
    higher-order functions).
    """
    base = docs.select("doc_id", F.col(text_col).alias("_text"),
                       tokens(F.col(text_col)).alias("t"))
    return base.select(
        "doc_id",
        F.size("t").alias("n_tokens"),
        F.size(F.array_distinct("t")).alias("n_distinct_tokens"),
        F.length("_text").alias("text_len"),
        alpha_chars(F.col("_text")).alias("n_alpha"),
    )


def quality_score(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic quality signals: stopword ratio, mean token length,
    repetition ratio; boolean keep-flag."""
    base = docs.select("doc_id", F.col(text_col).alias("_text"),
                       tokens(F.col(text_col)).alias("t"))
    counted = base.select(
        "doc_id",
        F.size("t").alias("n_tokens"),
        marker_hits(F.col("t"), EN_STOPWORDS).alias("n_stopwords"),
        F.size(F.array_distinct("t")).alias("n_distinct"),
        alpha_chars(F.col("_text")).alias("n_alpha"),
    )
    stop_ratio = F.col("n_stopwords").cast("double") / F.col("n_tokens").cast("double")
    rep_ratio = F.col("n_distinct").cast("double") / F.col("n_tokens").cast("double")
    return counted.select(
        "doc_id", "n_tokens", "n_stopwords",
        stop_ratio.alias("stopword_ratio"),
        rep_ratio.alias("distinct_ratio"),
        (F.col("n_alpha").cast("double") / F.col("n_tokens").cast("double"))
        .alias("mean_token_len"),
        ((F.col("n_tokens") >= 20) & (stop_ratio < 0.5) & (rep_ratio > 0.1)).alias("keep"),
    )


# PII patterns portable across Java regex (Spark) and RE2 (DuckDB): no
# lookarounds, ASCII \b boundaries, explicit character classes only.
PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IPV4 = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PII_PHONE = r"\b\d{3}-\d{3}-\d{4}\b"


def pii_scan(docs: DataFrame, text_col: str = "text",
             id_col: str = "doc_id") -> DataFrame:
    """PII detection + redaction: per-document counts of emails,
    phone numbers, and IPv4 addresses, plus the fingerprint of the
    redacted text (<EMAIL>/<IP>/<PHONE> placeholders) so downstream
    stages can verify they consumed the scrubbed corpus.

    The counts are independent pattern counts over the ORIGINAL text,
    not a redaction ledger: redaction is sequential (email, then IP,
    then phone), so a later pattern embedded inside an earlier match
    (an IP inside an email's domain) is counted but was consumed by the
    earlier replacement rather than its own placeholder.

    Scale design: a narrow per-row map -- three regexp_count and three
    regexp_replace expressions, all JVM-side inside whole-stage codegen;
    no shuffle, pure scan bandwidth at 100 TB.  Redaction order matters:
    emails first (their domains contain dots that the IPv4 pattern must
    never see), then IPs, then phones.
    """
    t = F.col(text_col)
    red = F.regexp_replace(t, PII_EMAIL, "<EMAIL>")
    red = F.regexp_replace(red, PII_IPV4, "<IP>")
    red = F.regexp_replace(red, PII_PHONE, "<PHONE>")
    n_email = F.regexp_count(t, F.lit(PII_EMAIL)).cast("long")
    n_ipv4 = F.regexp_count(t, F.lit(PII_IPV4)).cast("long")
    n_phone = F.regexp_count(t, F.lit(PII_PHONE)).cast("long")
    return docs.select(
        F.col(id_col).alias("doc_id"),
        n_email.alias("n_email"),
        n_phone.alias("n_phone"),
        n_ipv4.alias("n_ipv4"),
        (n_email + n_phone + n_ipv4 > 0).alias("has_pii"),
        F.md5(red).alias("redacted_fp"),
    )


def repetition_stats(docs: DataFrame, text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """Gopher/C4-style repetition gate: most-frequent-token count,
    distinct-token count, and symbol-character count per document, with a
    keep flag from integer-only cross-multiplied thresholds (top token
    <= 20% of tokens, distinct >= 30% of tokens, symbols <= 10% of chars)
    so any SQL engine reproduces the booleans bit-for-bit.

    Scale design: explode -> (doc, token) hash agg -> (doc) hash agg.
    Both aggregations are keyed by doc_id (+token) with map-side partial
    combine, so the shuffles stay linear in corpus size and per-key state
    is one counter -- no per-document collection of token lists.
    """
    tok = (docs.select(F.col(id_col).alias("doc_id"),
                       tokens(F.col(text_col)).alias("t"))
           .select("doc_id", F.explode("t").alias("tok")))
    per_tok = tok.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("c"))
    per_doc = (per_tok.groupBy("doc_id")
               .agg(F.max("c").alias("top_token_cnt"),
                    F.sum("c").alias("n_tokens"),
                    F.count(F.lit(1)).alias("n_distinct_tokens")))
    chars = docs.select(
        F.col(id_col).alias("doc_id"),
        F.length(text_col).alias("n_chars"),
        F.length(F.regexp_replace(text_col, r"[A-Za-z0-9\s]", ""))
        .alias("n_symbol_chars"))
    out = (chars.join(per_doc, "doc_id", "left")
           .na.fill({"top_token_cnt": 0, "n_tokens": 0,
                     "n_distinct_tokens": 0}))
    keep = ((F.col("n_tokens") > 0)
            & (F.col("top_token_cnt") * 5 <= F.col("n_tokens"))
            & (F.col("n_distinct_tokens") * 10 >= F.col("n_tokens") * 3)
            & (F.col("n_symbol_chars") * 10 <= F.col("n_chars")))
    return out.select("doc_id", "n_tokens", "n_distinct_tokens",
                      "top_token_cnt", "n_chars", "n_symbol_chars",
                      keep.alias("keep"))


def bigram_pairs(docs: DataFrame, text_col: str = "text",
                 id_col: str = "doc_id") -> DataFrame:
    """(doc_id, w1, w2) adjacent-token pairs per document; documents with
    fewer than two tokens contribute no rows. A narrow per-row map +
    explode -- no shuffle; the zip of the two shifted slices stays
    inside codegen."""
    t = tokens(F.col(text_col))
    base = (docs.select(F.col(id_col).alias("doc_id"), t.alias("t"))
            .filter(F.size("t") >= 2))
    z = F.zip_with(F.slice("t", 1, F.size("t") - 1),
                   F.slice("t", 2, F.size("t") - 1),
                   lambda a, b: F.struct(a.alias("w1"), b.alias("w2")))
    return (base.select("doc_id", F.explode(z).alias("z"))
            .select("doc_id", "z.w1", "z.w2"))
