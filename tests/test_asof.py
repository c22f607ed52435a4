"""as_of_join unit semantics: backward match, <= at equal times, null
when nothing precedes, same-right-row column consistency."""

from __future__ import annotations


def test_asof_semantics(spark):
    from cassandra_sstable_to_protocolbuf_spark.operators.asof import as_of_join

    left = spark.createDataFrame(
        [("a", 5, "e1"), ("a", 10, "e2"), ("a", 20, "e3"), ("b", 7, "e4")],
        "k string, t long, ev string")
    right = spark.createDataFrame(
        [("a", 10, 100, "x"), ("a", 15, 150, "y"), ("c", 1, 10, "z")],
        "k string, rt long, rv long, tag string")
    out = {r.ev: (r.rv, r.tag) for r in as_of_join(
        left, right, by="k", left_time="t", right_time="rt",
        value_cols=["rv", "tag"]).collect()}
    assert out["e1"] == (None, None)          # nothing at or before t=5
    assert out["e2"] == (100, "x")            # equal time matches (<=)
    assert out["e3"] == (150, "y")            # latest preceding, not first
    assert out["e4"] == (None, None)          # key with no right rows at all


def test_asof_join_null_semantics(spark):
    """JOIN null semantics, matching DuckDB ASOF: null keys never match,
    null right times never carry, null left times attach nothing."""
    from cassandra_sstable_to_protocolbuf_spark.operators.asof import as_of_join

    left = spark.createDataFrame(
        [(None, 5, "l-nullkey"), (1, 5, "l-k1"), (1, None, "l-nulltime")],
        "k int, t int, tag string")
    right = spark.createDataFrame(
        [(None, 3, "r-nullkey"), (1, None, "r-nulltime"), (1, 4, "r-real")],
        "k int, t int, v string")
    got = {r["tag"]: r["v"] for r in
           as_of_join(left, right, by="k", left_time="t", right_time="t",
                      value_cols=["v"]).collect()}
    assert got == {"l-nullkey": None,   # null key matches nothing
                   "l-k1": "r-real",    # real backward match
                   "l-nulltime": None}  # null left time attaches nothing
