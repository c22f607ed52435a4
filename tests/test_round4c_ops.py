"""Property pins for the round-4 late-batch operators, beyond the oracle
parity sweep: Bellman-Ford == dict-model shortest path, CF rank ==
float-cosine order, blocked linkage == brute-force argmin (and recall),
rolling distinct == per-day brute force, interval overlap == pandas
recompute, ACF == numpy Pearson.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from cassandra_sstable_to_protocolbuf_spark.plans import relational as R
from tests.conftest import SF_SMOKE


def _copurchase_pandas():
    li = pd.read_parquet(f"{SF_SMOKE}/lineitem.parquet",
                         columns=["l_orderkey", "l_partkey"])
    items = li.drop_duplicates()
    pairs = items.merge(items, on="l_orderkey")
    pairs = pairs[pairs.l_partkey_x < pairs.l_partkey_y]
    g = (pairs.groupby(["l_partkey_x", "l_partkey_y"]).size()
         .reset_index(name="n_both"))
    return g[g.n_both >= 2]


def test_sssp_equals_dict_model_bellman_ford(spark):
    """The relational relaxation rounds must equal the textbook
    dict-model Bellman-Ford bounded to the same hop count."""
    g = _copurchase_pandas()
    adj: dict[int, list[tuple[int, int]]] = {}
    for p1, p2, nb in g.itertuples(index=False):
        w = 1000 // int(nb)
        adj.setdefault(int(p1), []).append((int(p2), w))
        adj.setdefault(int(p2), []).append((int(p1), w))
    seed = min(adj)
    dist = {seed: 0}
    for _ in range(R.SSSP_ROUNDS):
        nxt = dict(dist)
        for node, d in dist.items():
            for nbr, w in adj[node]:
                if d + w < nxt.get(nbr, 1 << 60):
                    nxt[nbr] = d + w
        dist = nxt
    out = R.part_sssp_weighted(spark, SF_SMOKE).toPandas()
    got = dict(zip(out.part.astype(int), out.dist.astype(int)))
    assert got == dist


def test_item_cf_rank_follows_float_cosine(spark):
    """The integer fixed-point rank key must order neighbors exactly as
    the float cosine does (monotone check), and every kept row must
    respect rank<=3 and the support floor."""
    out = R.part_item_cf(spark, SF_SMOKE).toPandas()
    assert (out.n_both >= 2).all()
    assert set(out["rank"]) <= {1, 2, 3}
    for _, grp in out.groupby("part"):
        grp = grp.sort_values("rank")
        cos = grp.cosine.to_numpy()
        # non-increasing cosine down the ranks (strict drops whenever the
        # integer key strictly drops)
        assert (np.diff(cos) <= 1e-12).all()
        assert grp["rank"].tolist() == list(range(1, len(grp) + 1))


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def test_linkage_equals_brute_force_and_recovers_at_distance_one(spark):
    """Blocked linkage == the literal brute-force argmin (the pigeonhole
    guarantee), and every match lands at distance <= 1 (the true
    canonical is always one deletion away)."""
    out = R.part_name_linkage(spark, SF_SMOKE).toPandas()
    p = pd.read_parquet(f"{SF_SMOKE}/part.parquet",
                        columns=["p_partkey", "p_name", "p_brand"])
    p["s"] = p.p_name + " " + p.p_brand
    canon = sorted(p.s.unique())
    assert len(out) == len(p)
    assert (out.lev <= 1).all()
    by_id = out.set_index("dirty_id")
    for _, row in p.sample(n=min(60, len(p)), random_state=11).iterrows():
        pos = int(row.p_partkey) % len(row.s)
        dirty = row.s[:pos] + row.s[pos + 1:]
        best = min(canon, key=lambda c: (_lev(dirty, c), c))
        got = by_id.loc[int(row.p_partkey)]
        assert got["dirty"] == dirty
        assert got["canon"] == best


def test_rolling_distinct_equals_per_day_brute_force(spark):
    out = (R.events_rolling_distinct(spark, SF_SMOKE).toPandas()
           .set_index("day"))
    ev = pd.read_parquet(f"{SF_SMOKE}/events.parquet",
                         columns=["ts", "user_id"])
    ev["d"] = ev.ts.dt.normalize()
    days = sorted(ev.d.unique())
    assert len(out) == len(days)
    for day in days:
        win = ev[(ev.d <= day) & (ev.d >= day - pd.Timedelta(days=6))]
        key = pd.Timestamp(day).strftime("%Y-%m-%d")
        assert out.loc[key, "users_7d"] == win.user_id.nunique()
        assert out.loc[key, "users_1d"] == \
            ev[ev.d == day].user_id.nunique()
        assert out.loc[key, "users_7d"] >= out.loc[key, "users_1d"]


def test_incident_overlap_equals_pandas_recompute(spark):
    out = R.events_incident_overlap(spark, SF_SMOKE).toPandas()
    ev = pd.read_parquet(f"{SF_SMOKE}/events.parquet",
                         columns=["ts", "user_id", "event_type"])
    ev["us"] = ev.ts.astype("datetime64[us]").astype("int64")
    ev["d"] = ev.ts.dt.strftime("%Y-%m-%d")
    act = ev.groupby(["d", "user_id"]).us.agg(["min", "max"])
    inc = ev[ev.event_type == "error"].groupby("d").us.agg(["min", "max"])
    want = {}
    for (d, u), a in act.iterrows():
        if d not in inc.index:
            continue
        i = inc.loc[d]
        ov = min(a["max"], i["max"]) - max(a["min"], i["min"])
        if ov > 0:
            want[(d, u)] = ov
    got = {(r.day, r.user_id): r.overlap_us for r in out.itertuples()}
    assert got == want


def test_acf_matches_numpy_pearson(spark):
    out = R.events_acf(spark, SF_SMOKE).toPandas().set_index("lag")
    ev = pd.read_parquet(f"{SF_SMOKE}/events.parquet", columns=["ts"])
    counts = (ev.ts.dt.normalize().value_counts().sort_index())
    idx = counts.index
    for k in range(1, 8):
        x, y = [], []
        for d in idx:
            prev = d - pd.Timedelta(days=k)
            if prev in counts.index:
                x.append(counts[d])
                y.append(counts[prev])
        assert out.loc[k, "n"] == len(x)
        r = np.corrcoef(x, y)[0, 1]
        assert abs(out.loc[k, "acf"] - r) < 1e-9
        assert -1.0 <= out.loc[k, "acf"] <= 1.0


def _daily_counts():
    ev = pd.read_parquet(f"{SF_SMOKE}/events.parquet",
                         columns=["ts", "event_type"])
    ev["day"] = ev.ts.dt.strftime("%Y-%m-%d")
    return (ev.groupby(["event_type", "day"]).size()
            .reset_index(name="y").sort_values(["event_type", "day"]))


def _trunc_div(a: int, b: int) -> int:
    q = abs(a) // b
    return q if a >= 0 else -q


def test_holt_trend_matches_sequential_recompute(spark):
    """The distributed fold must equal the literal per-type sequential
    Holt recurrence (truncating division, micro-unit fixed point)."""
    out = R.events_holt_trend(spark, SF_SMOKE).toPandas()
    got = {(r.event_type, r.day): (r.level_fp, r.trend_fp)
           for r in out.itertuples()}
    daily = _daily_counts()
    n_rows = 0
    for et, grp in daily.groupby("event_type"):
        lv = tr = None
        for _, row in grp.iterrows():
            y = int(row.y) * 1_000_000
            if lv is None:
                lv, tr = y, 0
            else:
                nl = _trunc_div(y + 3 * (lv + tr), 4)
                tr = _trunc_div((nl - lv) + 3 * tr, 4)
                lv = nl
            assert got[(et, row.day)] == (lv, tr)
            n_rows += 1
    assert n_rows == len(out)


def test_cusum_matches_sequential_recompute_and_alarm_rule(spark):
    out = R.events_cusum(spark, SF_SMOKE).toPandas()
    assert (out.cusum_fp >= 0).all()
    assert (out.alarm == (out.cusum_fp > 3 * out.ref_fp)).all()
    got = {(r.event_type, r.day): r.cusum_fp for r in out.itertuples()}
    daily = _daily_counts()
    for et, grp in daily.groupby("event_type"):
        ys = [int(y) * 1_000_000 for y in grp.y]
        ref = sum(ys[:7]) // 7
        s = 0
        for y, day in zip(ys, grp.day):
            s = max(0, s + y - ref)
            assert got[(et, day)] == s


def test_stream_cusum_equals_batch_and_exercises_warmup(spark):
    """Ordered streaming replay with the cross-batch calibration warmup
    must reproduce the two-pass batch CUSUM exactly; the 5-day slices
    guarantee the pending path actually spans batches (5 < 7)."""
    from cassandra_sstable_to_protocolbuf_spark.streaming import (
        pipeline as ST)

    batch = (R.events_cusum(spark, SF_SMOKE).toPandas()
             .sort_values(["event_type", "day"]).reset_index(drop=True))
    stream = (ST.stream_cusum(spark, SF_SMOKE).toPandas()
              [batch.columns]
              .sort_values(["event_type", "day"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(stream, batch)
    # retroactive emit really happened: every type has its FIRST day
    # scored even though the reference needed 7 days of data
    first_days = stream.groupby("event_type").day.min()
    assert (first_days == stream.day.min()).all()


def test_benford_audit_shares_and_chi2_are_consistent(spark):
    out = R.orders_benford_audit(spark, SF_SMOKE).toPandas()
    assert set(out.digit) == set(range(1, 10))
    assert abs(out.benford_share.sum() - 1.0) < 1e-9
    assert abs(out.observed_share.sum() - 1.0) < 1e-12
    assert (out.chi2_term >= 0).all()
    n = out.n.sum()
    exp = out.benford_share * n
    want = ((out.n - exp) ** 2 / exp)
    assert np.allclose(out.chi2_term, want, rtol=1e-12)


def test_bpe_encode_equals_textbook_bpe(spark):
    """The anchored-replace encoding must equal a literal textbook BPE:
    train 4 merges on the corpus word-freq table (max count, ties by
    lexically smallest symbol pair), then greedily merge each word
    left-to-right, rank by rank."""
    from collections import Counter

    from cassandra_sstable_to_protocolbuf_spark.plans import textops as TX

    docs = pd.read_parquet(f"{SF_SMOKE}/documents.parquet",
                           columns=["doc_id", "text"])
    words_per_doc = {
        r.doc_id: [w for w in r.text.lower().split() if w]
        for r in docs.itertuples()}
    wf = Counter(w for ws in words_per_doc.values() for w in ws)

    def pair_counts(vocab):
        c = Counter()
        for syms, freq in vocab:
            for i in range(len(syms) - 1):
                c[(syms[i], syms[i + 1])] += freq
        return c

    def apply_merge(syms, a, b):
        # merged symbol = a stripped of its bars + b (the engine builds
        # replace(a, '|', '') || b)
        out, i = [], 0
        merged = a.replace("|", "") + b
        while i < len(syms):
            if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                out.append(merged)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        return out

    # markered symbols match the engine's tie-break domain exactly
    vocab = [([ch + "|" for ch in w], f)
             for w, f in wf.items() if len(w) >= 2]
    merges = []
    for _ in range(TX.BPE_ENCODE_ROUNDS):
        pc = pair_counts(vocab)
        best = max(pc.values())
        a, b = min(k for k, v in pc.items() if v == best)
        merges.append((a, b))
        vocab = [(apply_merge(s, a, b), f) for s, f in vocab]

    def encode(w):
        syms = [ch + "|" for ch in w]
        for a, b in merges:
            syms = apply_merge(syms, a, b)
        return syms

    out = (TX.docs_bpe_encode(spark, SF_SMOKE).toPandas()
           .set_index("doc_id"))
    assert len(out) == len(docs)
    for doc_id, ws in list(words_per_doc.items())[:200]:
        row = out.loc[doc_id]
        assert row["n_words"] == len(ws)
        assert row["n_word_chars"] == sum(len(w) for w in ws)
        assert row["n_bpe"] == sum(len(encode(w)) for w in ws)


def test_recursive_hierarchy_closed_form(spark):
    """Depth of 1-based id k in the binary hierarchy is floor(log2 k),
    and the chain price is the exact sum of the ancestor ids' prices."""
    import math

    out = (R.sql_recursive_hierarchy(spark, SF_SMOKE).toPandas()
           .set_index("p_partkey"))
    p = pd.read_parquet(f"{SF_SMOKE}/part.parquet",
                        columns=["p_partkey", "p_retailprice"])
    price_c = {int(r.p_partkey) + 1: round(r.p_retailprice * 100)
               for r in p.itertuples()}
    assert len(out) == len(p)
    for key in list(price_c)[:100]:
        k, total = key, 0
        while k >= 1:
            total += price_c[k]
            k //= 2
        row = out.loc[key - 1]
        assert row["depth"] == int(math.floor(math.log2(key)))
        assert row["chain_price_c"] == total


def test_bootstrap_ci_matches_literal_resampling(spark):
    """The distributed Poisson bootstrap must equal a literal pandas
    recompute with the same deterministic weights, and the CI must
    bracket the point estimate with sane width."""
    from cassandra_sstable_to_protocolbuf_spark.operators.corpus import (
        HASH_A, HASH_C, HASH_M, HASH_P)

    out = R.events_bootstrap_ci(spark, SF_SMOKE).toPandas().iloc[0]
    ev = pd.read_parquet(f"{SF_SMOKE}/events.parquet",
                         columns=["event_id", "value"])
    x = (ev.value * 1_000_000).round().astype("int64").to_numpy()
    eid = ev.event_id.to_numpy()
    means = []
    for b in range(R.BOOTSTRAP_REPLICAS):
        u = ((eid % HASH_P) * HASH_A + HASH_C
             + b * R.BOOTSTRAP_MIX) % HASH_M
        w = np.searchsorted(np.array(R.BOOTSTRAP_THRESHOLDS), u,
                            side="right")
        means.append((b, (w * x).sum() / w.sum() / 1e6))
    means.sort(key=lambda t: (t[1], t[0]))
    assert out["n_replicas"] == R.BOOTSTRAP_REPLICAS
    assert out["ci_lo"] == means[2][1]
    assert out["ci_hi"] == means[97][1]
    assert out["ci_lo"] <= out["point_mean"] <= out["ci_hi"]
    assert abs(out["point_mean"] - x.sum() / len(x) / 1e6) < 1e-9


def test_burstiness_matches_numpy_and_is_bounded(spark):
    out = R.events_burstiness(spark, SF_SMOKE).toPandas()
    assert ((out.burstiness > -1) & (out.burstiness < 1)).all()
    ev = pd.read_parquet(f"{SF_SMOKE}/events.parquet",
                         columns=["user_id", "ts", "event_id"])
    ev["us"] = ev.ts.astype("datetime64[us]").astype("int64")
    got = out.set_index("user_id")
    n_checked = 0
    for uid, grp in ev.groupby("user_id"):
        grp = grp.sort_values(["us", "event_id"])
        gaps = (np.diff(grp.us.to_numpy()) // 1_000_000).astype("int64")
        if len(gaps) < 2:
            assert uid not in got.index
            continue
        row = got.loc[uid]
        assert row["n_gaps"] == len(gaps)
        assert row["sg"] == gaps.sum()
        assert row["sg2"] == (gaps.astype(object) ** 2).sum()
        assert row["max_gap_s"] == gaps.max()
        mu = gaps.sum() / len(gaps)
        sigma = np.sqrt(((gaps - mu) ** 2).mean())
        assert abs(row["stddev_gap_s"] - sigma) < 1e-6 * max(sigma, 1)
        n_checked += 1
    assert n_checked == len(out)


def test_covariance_matches_numpy_and_is_symmetric(spark):
    from cassandra_sstable_to_protocolbuf_spark.plans import vectorops as V

    out = V.emb_covariance(spark, SF_SMOKE).toPandas()
    assert len(out) == 64 * 64
    emb = pd.read_parquet(f"{SF_SMOKE}/embeddings.parquet",
                          columns=["embedding"])
    X = np.stack(emb.embedding.to_numpy()) * V.EMB_COV_SCALE
    Xq = np.where(X >= 0, np.floor(X + 0.5), np.ceil(X - 0.5))
    want = np.cov(Xq, rowvar=False, bias=True) / V.EMB_COV_SCALE ** 2
    got = out.pivot(index="i", columns="j", values="cov").to_numpy()
    assert np.allclose(got, want, atol=1e-12)
    assert np.allclose(got, got.T)  # exact integer moments => symmetric
    assert (np.diag(got) >= 0).all()


def test_stream_holt_equals_batch(spark):
    """Ordered streaming replay must reproduce the batch coupled
    recurrence bit-for-bit."""
    from cassandra_sstable_to_protocolbuf_spark.streaming import (
        pipeline as ST)

    batch = (R.events_holt_trend(spark, SF_SMOKE).toPandas()
             .sort_values(["event_type", "day"]).reset_index(drop=True))
    stream = (ST.stream_holt_trend(spark, SF_SMOKE).toPandas()
              [batch.columns]
              .sort_values(["event_type", "day"]).reset_index(drop=True))
    pd.testing.assert_frame_equal(stream, batch)


def test_tdiv_matches_both_engines_integer_division(spark, duck):
    """The recurrences assume BOTH engines' integer division truncates
    toward zero (Python's // floors, so _tdiv exists). Pin both
    engines' semantics across signs so an upgrade that switches to
    floor division fails loudly here instead of corrupting a
    recurrence."""
    cases = [(a, b) for a in range(-17, 18) for b in (1, 2, 3, 4, 7)]
    vals = ", ".join(f"({a}, {b})" for a, b in cases)
    for got_rows in (
        duck.execute(
            f"SELECT a, b, CAST(a AS BIGINT) // b "
            f"FROM (VALUES {vals}) t(a, b)").fetchall(),
        [tuple(r) for r in spark.sql(
            f"SELECT a, b, CAST(a AS BIGINT) DIV b "
            f"FROM (VALUES {vals}) t(a, b)").collect()],
    ):
        for a, b, got in got_rows:
            assert got == R._tdiv(a, b), (a, b, got)


def test_seasonal_decompose_identity_and_ma(spark):
    """y reconstructs exactly: 7y = trend_x7 + seas_x7 + resid_x7 (the
    additive identity in sevenths), the trend is the literal centered
    7-row moving average, and the weekday index is the truncated mean
    of that weekday's detrended values."""
    out = R.events_seasonal_decompose(spark, SF_SMOKE).toPandas()
    assert ((7 * out.y - out.trend_x7
             == out.seas_x7 + out.resid_x7).all())
    ev = pd.read_parquet(f"{SF_SMOKE}/events.parquet",
                         columns=["ts", "event_type"])
    ev["day"] = ev.ts.dt.strftime("%Y-%m-%d")
    daily = (ev.groupby(["event_type", "day"]).size()
             .reset_index(name="y").sort_values(["event_type", "day"]))
    for et, grp in daily.groupby("event_type"):
        ys = grp.y.to_numpy()
        days = grp.day.to_numpy()
        sub = out[out.event_type == et].set_index("day")
        assert len(sub) == max(0, len(ys) - 6)
        for i in range(3, len(ys) - 3):
            assert sub.loc[days[i], "trend_x7"] == ys[i - 3:i + 4].sum()


def test_cohort_ltv_matches_pandas_and_is_monotone(spark):
    out = R.orders_cohort_ltv(spark, SF_SMOKE).toPandas()
    o = pd.read_parquet(f"{SF_SMOKE}/orders.parquet",
                        columns=["o_custkey", "o_orderdate", "o_totalprice"])
    o["mi"] = o.o_orderdate.dt.year * 12 + o.o_orderdate.dt.month - 1
    o["cents"] = (o.o_totalprice * 100).round().astype("int64")
    first = o.groupby("o_custkey").mi.min().rename("cohort_mi")
    o = o.join(first, on="o_custkey")
    o["age"] = o.mi - o.cohort_mi
    grid = (o.groupby(["cohort_mi", "age"]).cents.sum()
            .groupby(level=0).cumsum())
    sizes = first.value_counts()
    for _, grp in out.groupby("cohort"):
        grp = grp.sort_values("age")
        assert (grp.cum_revenue_c.diff().dropna() > 0).all()
        assert (grp.ltv_per_customer.diff().dropna() > 0).all()
    for r in out.itertuples():
        y, m = map(int, r.cohort.split("-"))
        mi = y * 12 + m - 1
        assert r.cum_revenue_c == grid.loc[(mi, r.age)]
        assert r.n_customers == sizes.loc[mi]


def test_recursive_subtree_closed_form(spark):
    """Subtree sums over the binary hierarchy equal a literal bottom-up
    recompute, and the root's subtree covers the whole table."""
    out = (R.sql_recursive_subtree(spark, SF_SMOKE).toPandas()
           .set_index("p_partkey"))
    p = pd.read_parquet(f"{SF_SMOKE}/part.parquet",
                        columns=["p_partkey", "p_retailprice"])
    n = len(p)
    price_c = {int(r.p_partkey) + 1: round(r.p_retailprice * 100)
               for r in p.itertuples()}
    size, total = {}, {}
    for k in sorted(price_c, reverse=True):  # leaves first
        size[k] = 1 + size.get(2 * k, 0) + size.get(2 * k + 1, 0)
        total[k] = (price_c[k] + total.get(2 * k, 0)
                    + total.get(2 * k + 1, 0))
    assert len(out) == n
    assert out.loc[0, "subtree_size"] == n
    assert out.loc[0, "subtree_price_c"] == sum(price_c.values())
    for k in list(price_c)[:120]:
        assert out.loc[k - 1, "subtree_size"] == size[k]
        assert out.loc[k - 1, "subtree_price_c"] == total[k]


def test_stream_bootstrap_equals_batch(spark):
    from cassandra_sstable_to_protocolbuf_spark.streaming import (
        pipeline as ST)

    batch = R.events_bootstrap_ci(spark, SF_SMOKE).toPandas()
    stream = ST.stream_bootstrap_ci(spark, SF_SMOKE).toPandas()[batch.columns]
    pd.testing.assert_frame_equal(stream, batch)


def test_novelty_matches_first_bearer_model(spark):
    """Novelty == literal first-bearer bookkeeping over doc_id order,
    and the first document is always fully novel."""
    from cassandra_sstable_to_protocolbuf_spark.plans import textops as TX

    out = (TX.docs_novelty(spark, SF_SMOKE).toPandas()
           .set_index("doc_id").sort_index())
    docs = pd.read_parquet(f"{SF_SMOKE}/documents.parquet",
                           columns=["doc_id", "text"]).sort_values("doc_id")
    seen: set = set()
    for r in docs.itertuples():
        toks = [w for w in r.text.lower().split() if w]
        shs = {" ".join(toks[i:i + 3]) for i in range(len(toks) - 2)}
        if not shs:
            assert r.doc_id not in out.index
            continue
        novel = shs - seen
        seen |= shs
        row = out.loc[r.doc_id]
        assert row["n_shingles"] == len(shs)
        assert row["n_novel"] == len(novel)
    first_doc = out.index.min()
    assert out.loc[first_doc, "novelty"] == 1.0


def test_bench_headline_names_resolve():
    """Every bench headline entry must name a catalog query (a typo here
    would crash the driver's official bench run and lose the round's
    performance record), and no headline name repeats."""
    import bench

    from cassandra_sstable_to_protocolbuf_spark.plans.catalog import CATALOG

    missing = [n for n in bench.HEADLINE if n not in CATALOG]
    assert not missing, f"bench names not in catalog: {missing}"
    assert len(bench.HEADLINE) == len(set(bench.HEADLINE))


def test_slo_burn_mixed_days_and_exact_accounting(spark):
    out = (R.events_slo_burn(spark, SF_SMOKE).toPandas()
           .sort_values("day").reset_index(drop=True))
    # the fixture straddles the objective: both day classes occur
    assert out.over_budget.any() and (~out.over_budget).any()
    # exact integer accounting
    assert (out.burn_units
            == out.n_err * 10_000 - out.n_total * R.SLO_BP).all()
    assert (out.cum_burn_units == out.burn_units.cumsum()).all()
    assert (out.cum_err == out.n_err.cumsum()).all()
    assert out.cum_total.iloc[-1] == out.n_total.sum()
    assert (out.slo_breached_to_date == (out.cum_burn_units > 0)).all()
