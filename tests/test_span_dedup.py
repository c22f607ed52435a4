"""Span-level exact-substring dedup: the audit (dup_span_stats) and the
rewrite (scrub_dup_spans) must agree with each other and with first
principles on a corpus with a known copied passage."""

from __future__ import annotations

from pyspark.sql import functions as F

from cassandra_sstable_to_protocolbuf_spark.operators.dedup import (
    dup_span_stats, scrub_dup_spans)

PASSAGE = "one two three four five six seven eight"  # exactly k=8 tokens


def _corpus(spark):
    rows = [
        # doc 0 and 1 share the 8-token passage, with distinct tails
        (0, PASSAGE + " alpha beta gamma"),
        (1, "prefix words here " + PASSAGE + " delta"),
        # doc 2 is clean: no 8-window occurs elsewhere
        (2, "totally different content with no copied passage at all ok"),
        # doc 3 is a verbatim replica of doc 0 -> fully covered
        (3, PASSAGE + " alpha beta gamma"),
        # doc 4 is shorter than one window -> zero windows, zero dups
        (4, "tiny doc"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_audit_flags_exactly_the_copied_spans(spark):
    stats = {r["doc_id"]: r for r in
             dup_span_stats(_corpus(spark), k=8).collect()}
    assert stats[2]["n_dup_tokens"] == 0
    assert stats[4]["n_dup_tokens"] == 0 and stats[4]["n_tokens"] == 2
    # docs 0 and 3 are verbatim replicas: every token covered
    for d in (0, 3):
        assert stats[d]["n_dup_tokens"] == stats[d]["n_tokens"]
        assert stats[d]["dup_ratio"] == 1.0
    # doc 1 shares only the 8-token passage (its prefix/suffix differ)
    assert stats[1]["n_dup_tokens"] == 8


def test_scrub_agrees_with_audit_and_first_principles(spark):
    corpus = _corpus(spark)
    audit = {r["doc_id"]: r for r in dup_span_stats(corpus, k=8).collect()}
    scrub = {r["doc_id"]: r for r in scrub_dup_spans(corpus, k=8).collect()}
    for d in audit:
        assert scrub[d]["n_tokens"] == audit[d]["n_tokens"]
        assert scrub[d]["n_kept"] == (audit[d]["n_tokens"]
                                      - audit[d]["n_dup_tokens"]), d
    # fully-duplicated replicas scrub to the empty string
    empty_md5 = "d41d8cd98f00b204e9800998ecf8427e"
    assert scrub[0]["scrubbed_fp"] == empty_md5
    assert scrub[3]["scrubbed_fp"] == empty_md5
    # doc 1 keeps exactly its prefix + suffix in original order
    import hashlib
    expect = "prefix words here delta"
    assert scrub[1]["scrubbed_fp"] == hashlib.md5(expect.encode()).hexdigest()
    # clean docs keep their full text
    assert scrub[2]["n_kept"] == scrub[2]["n_tokens"]
