"""Property pins for the round-4 continuation operators, beyond the
oracle parity sweep: each test asserts a semantic invariant the
hash gate alone would not explain (leakage-freedom, BFS minimality,
sweep-line == brute force, sampling determinism, NTILE balance).
"""

from __future__ import annotations

from collections import deque

import pandas as pd
from pyspark.sql import functions as F

from cassandra_sstable_to_protocolbuf_spark.plans import relational as R
from cassandra_sstable_to_protocolbuf_spark.plans import textops as TX
from tests.conftest import SF_SMOKE


def test_pit_enrich_is_leakage_free(spark):
    """Every enriched label must be reproducible from ONLY events
    strictly before the label instant -- the feature-store guarantee.
    Brute-force per label over the raw events at the smoke SF."""
    out = R.events_pit_enrich(spark, SF_SMOKE).toPandas()
    ev = pd.read_parquet(f"{SF_SMOKE}/events.parquet")
    ev["ts_us"] = ev["ts"].astype("datetime64[us]").astype("int64")
    feats = ev[ev.event_type != "purchase"].sort_values(["ts_us", "event_id"])
    labels = ev[ev.event_type == "purchase"]
    assert len(out) == len(labels)
    by_label = out.set_index("event_id")
    for _, lab in labels.sample(n=min(80, len(labels)),
                                random_state=7).iterrows():
        prior = feats[(feats.user_id == lab.user_id)
                      & (feats.ts_us < lab.ts_us)]
        got = by_label.loc[lab.event_id]
        assert got["n_prior"] == len(prior)
        if len(prior):
            assert got["last_type"] == prior.iloc[-1].event_type
            # decimal(18,6) semantics: micro-unit integer running sum
            want = int(round(
                (prior.value.map(lambda v: round(v * 1e6))).sum()))
            assert round(got["value_prior"] * 1e6) == want
        else:
            assert got["last_type"] == "none" and got["value_prior"] == 0.0


def test_peak_concurrency_equals_brute_force(spark):
    """Sweep-line peak per day == literal 'count sessions covering t'
    maximum over all candidate instants (session starts + day starts --
    a day's peak is always attained at one of these)."""
    out = (R.events_peak_concurrency(spark, SF_SMOKE).toPandas()
           .set_index("day"))
    ev = (pd.read_parquet(f"{SF_SMOKE}/events.parquet")
          .assign(ts_us=lambda d: d["ts"].astype("datetime64[us]").astype("int64"))
          .sort_values(["user_id", "ts_us", "event_id"]))
    sessions = []
    for _, g in ev.groupby("user_id"):
        start = prev = None
        for t in g.ts_us:
            if start is None:
                start = prev = t
            elif t - prev > 1_800_000_000:
                sessions.append((start, prev))
                start = prev = t
            else:
                prev = t
        if start is not None:
            sessions.append((start, prev))
    us_day = 86_400_000_000
    days = sorted({s // us_day for s, _ in sessions}
                  | {e // us_day for _, e in sessions})
    for day in days:
        cands = ({s for s, _ in sessions
                  if day * us_day <= s < (day + 1) * us_day}
                 | {day * us_day})
        peak = max(sum(1 for s, e in sessions if s <= t <= e)
                   for t in cands)
        key = str(pd.Timestamp(int(day) * 86_400, unit="s").date())
        assert out.loc[key, "peak_concurrency"] == peak, day


def test_bfs_hops_are_minimal(spark):
    """Engine BFS distances == textbook queue BFS over the collected
    edge list (bounded: support>=2 co-purchase graph at smoke SF)."""
    got = {r["part"]: r["dist"]
           for r in R.part_bfs_hops(spark, SF_SMOKE).collect()}
    pairs = R._copurchase_pairs(spark, SF_SMOKE).collect()
    adj: dict[int, set[int]] = {}
    for r in pairs:
        adj.setdefault(r["p1"], set()).add(r["p2"])
        adj.setdefault(r["p2"], set()).add(r["p1"])
    seed = min(adj)
    dist = {seed: 0}
    q = deque([seed])
    while q:
        u = q.popleft()
        if dist[u] >= 4:
            continue
        for v in adj[u]:
            if v not in dist:
                dist[v] = dist[u] + 1
                q.append(v)
    assert got == dist


def test_negative_samples_are_true_negatives_and_stable(spark):
    out = R.orders_negative_samples(spark, SF_SMOKE).toPandas()
    li = pd.read_parquet(f"{SF_SMOKE}/lineitem.parquet")
    orders = pd.read_parquet(f"{SF_SMOKE}/orders.parquet")
    pos = (li.merge(orders, left_on="l_orderkey", right_on="o_orderkey")
           [["o_custkey", "l_partkey"]].drop_duplicates())
    pos_set = set(map(tuple, pos.values))
    assert not any((u, p) in pos_set for u, p in zip(out.user_id, out.part))
    per_user = out.groupby("user_id").size()
    assert (per_user == 5).all()  # 15 draws vs sparse positives: no shortfall
    again = R.orders_negative_samples(spark, SF_SMOKE).toPandas()
    pd.testing.assert_frame_equal(
        out.sort_values(["user_id", "draw"]).reset_index(drop=True),
        again.sort_values(["user_id", "draw"]).reset_index(drop=True))


def test_equidepth_bins_are_balanced(spark):
    out = R.lineitem_equidepth_bins(spark, SF_SMOKE).toPandas()
    li = pd.read_parquet(f"{SF_SMOKE}/lineitem.parquet")
    for flag, g in out.groupby("l_returnflag"):
        assert set(g["bin"]) == set(range(1, 11))
        assert g.n_rows.max() - g.n_rows.min() <= 1  # NTILE remainder rule
        assert g.n_rows.sum() == (li.l_returnflag == flag).sum()
        ordered = g.sort_values("bin")
        assert (ordered.lo.values[1:] >= ordered.hi.values[:-1]).all()


def test_udaf_second_max_matches_pandas(spark):
    out = (R.events_udaf_second_max(spark, SF_SMOKE).toPandas()
           .set_index("event_type"))
    ev = pd.read_parquet(f"{SF_SMOKE}/events.parquet")
    for etype, g in ev.groupby("event_type"):
        u = sorted(g.value.dropna().unique())
        assert out.loc[etype, "max_value"] == u[-1]
        assert out.loc[etype, "second_max_value"] == u[-2]


def test_sample_per_class_is_k_per_class_and_stable(spark):
    out = TX.docs_sample_per_class(spark, SF_SMOKE).toPandas()
    docs = pd.read_parquet(f"{SF_SMOKE}/documents.parquet")
    class_sizes = docs.groupby("lang").size()
    for lang, g in out.groupby("lang"):
        assert len(g) == min(20, class_sizes[lang])
        assert sorted(g.pick_rank) == list(range(1, len(g) + 1))
    again = TX.docs_sample_per_class(spark, SF_SMOKE).toPandas()
    assert set(out.doc_id) == set(again.doc_id)


def test_ewma_stays_in_prefix_band_and_respects_keys(spark):
    """Each EWMA value must lie within [min, max] of its user's value
    prefix (a convexity invariant of the recurrence), which also fails
    loudly if group state ever leaked across user boundaries."""
    out = R.events_ewma(spark, SF_SMOKE).toPandas()
    ev = (pd.read_parquet(f"{SF_SMOKE}/events.parquet")
          .assign(ts_us=lambda d: d["ts"].astype("datetime64[us]")
                  .astype("int64"),
                  v_fp=lambda d: (d["value"] * 1e6).round().astype("int64"))
          .sort_values(["user_id", "ts_us", "event_id"]))
    ev["lo"] = ev.groupby("user_id")["v_fp"].cummin()
    ev["hi"] = ev.groupby("user_id")["v_fp"].cummax()
    m = out.merge(ev[["event_id", "lo", "hi"]], on="event_id")
    assert len(m) == len(out)
    assert ((m.ewma_fp >= m.lo) & (m.ewma_fp <= m.hi)).all()


def test_winsorize_clips_about_five_percent_per_tail(spark):
    out = R.events_winsorize(spark, SF_SMOKE).toPandas()
    assert (out.n_clipped_low <= out.n * 0.06).all()
    assert (out.n_clipped_high <= out.n * 0.06).all()
    assert (out.n_clipped_low > 0).all() and (out.n_clipped_high > 0).all()
    assert (out.p05 < out.p95).all()


def test_quality_auc_matches_pandas_average_rank(spark):
    """Engine AUC == the textbook tie-aware (average-rank) Mann-Whitney
    AUC computed by pandas over the same score/label pairs."""
    row = TX.docs_quality_auc(spark, SF_SMOKE).collect()[0]
    # rebuild score/label via the gated docs_quality columns
    q = TX.docs_quality(spark, SF_SMOKE).toPandas()
    score = q.n_tokens - 2 * q.n_stopwords
    pos = q.keep.astype(int)
    r = score.rank(method="average")
    npos, nneg = pos.sum(), (1 - pos).sum()
    auc = (r[pos == 1].sum() - npos * (npos + 1) / 2) / (npos * nneg)
    assert row["n_pos"] == npos and row["n_neg"] == nneg
    assert abs(row["auc"] - auc) < 1e-12
    assert 0.5 < row["auc"] < 1.0  # non-degenerate separation


def test_drift_bins_partition_both_windows(spark):
    out = R.events_drift_bins(spark, SF_SMOKE).toPandas()
    ev = pd.read_parquet(f"{SF_SMOKE}/events.parquet")
    split = pd.Timestamp("2024-01-16")
    for etype, g in out.groupby("event_type"):
        sel = ev[ev.event_type == etype]
        assert g.n_ref.sum() == (sel.ts < split).sum()
        assert g.n_cur.sum() == (sel.ts >= split).sum()
        assert g.bin.between(1, 10).all()
        # reference deciles: every ref bin within one row of balance
        # is too strict under ties; just require all 10 bins present
        assert set(g.bin) == set(range(1, 11))


def test_prefix_filter_index_is_smaller_than_full_index(spark):
    """The efficiency claim behind prefix filtering: the candidate-join
    index (prefix rows) is a strict subset of the full inverted index,
    and hot shingles (the Zipf head that breaks a naive index join)
    are excluded from prefixes entirely."""
    from pyspark.sql import Window as W

    from cassandra_sstable_to_protocolbuf_spark.operators.dedup import (
        doc_shingles)
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    sh = doc_shingles(docs)
    sdf = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("df"))
    ranked = (sh.join(sdf, "shingle")
              .withColumn("pos", F.row_number().over(
                  W.partitionBy("doc_id").orderBy("df", "shingle")))
              .withColumn("sz", F.count(F.lit(1)).over(
                  W.partitionBy("doc_id"))))
    plen = (F.col("sz") - ((F.col("sz") * 60 + 99) / 100).cast("long") + 1)
    prefix = ranked.filter(F.col("pos") <= plen)
    n_all, n_prefix = sh.count(), prefix.count()
    assert n_prefix < n_all * 0.55  # ~|d|*0.4+1 of each doc
    # the most frequent shingle never appears in any prefix
    hottest = sdf.orderBy(F.desc("df")).first()["shingle"]
    assert prefix.filter(F.col("shingle") == hottest).count() == 0
