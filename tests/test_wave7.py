"""Differential tests for the round-7 wave-7 analytics operators:
each query's closed-form / windowed Spark plan is replayed by a small
pure-Python reference implementation of the textbook algorithm
(recursive CUSUM, sequential Kaplan-Meier product, pairwise
Mann-Whitney AUC, brute-force sequence support) on the collected
fixture rows.  The DuckDB oracles prove cross-engine agreement; these
prove both engines implement the intended ALGORITHM, not just the same
SQL."""

from __future__ import annotations

from collections import defaultdict

import pytest

from gcp_cloudsql_airflow_bigquery_spark.plans import advanced, events, quality


def test_cusum_matches_recursive_reference(spark, sf_dir):
    out = events.events_changepoint_cusum(spark, sf_dir).collect()
    by_type = defaultdict(list)
    for r in out:
        by_type[r["event_type"]].append(r)
    assert by_type, "no CUSUM rows"
    k, h = 0.5, 4.0
    for rows in by_type.values():
        rows.sort(key=lambda r: r["day"])
        c_pos = c_neg = 0.0
        for r in rows:
            z = r["zscore"]  # rounded(4); recurrence drift stays < 5e-4
            c_pos = max(0.0, c_pos + z - k)
            c_neg = max(0.0, c_neg - z - k)
            assert r["cusum_pos"] == pytest.approx(c_pos, abs=5e-3)
            assert r["cusum_neg"] == pytest.approx(c_neg, abs=5e-3)
            assert r["shift_up"] == (r["cusum_pos"] > h)
            assert r["shift_down"] == (r["cusum_neg"] > h)


def test_survival_km_matches_sequential_reference(spark, sf_dir):
    out = sorted(
        advanced.customer_survival_km(spark, sf_dir).collect(),
        key=lambda r: r["t_week"],
    )
    assert out
    total = sum(r["n_events"] + r["n_censored"] for r in out)
    at_risk = total
    surv = 1.0
    for r in out:
        assert r["n_risk"] == at_risk
        if surv > 0.0:
            surv *= 1.0 - r["n_events"] / r["n_risk"]
        assert r["survival"] == pytest.approx(surv, abs=1e-5)
        at_risk -= r["n_events"] + r["n_censored"]
    # monotone non-increasing, anchored in [0, 1]
    vals = [r["survival"] for r in out]
    assert all(a >= b for a, b in zip(vals, vals[1:]))
    assert 0.0 <= vals[-1] <= vals[0] <= 1.0


def test_auc_matches_pairwise_reference(spark, sf_dir):
    from pyspark.sql import functions as F

    from gcp_cloudsql_airflow_bigquery_spark.catalog import load_table
    from gcp_cloudsql_airflow_bigquery_spark.operators import textstats

    row = quality.doc_quality_auc_eval(spark, sf_dir).collect()[0]
    t = F.col("text")
    scored = (
        load_table(spark, sf_dir, "documents")
        .select(
            textstats.quality_score(t).alias("s"),
            (textstats.detect_lang(t) == "en").cast("int").alias("y"),
        )
        .collect()
    )
    pos = [r["s"] for r in scored if r["y"] == 1]
    neg = [r["s"] for r in scored if r["y"] == 0]
    assert row["n_pos"] == len(pos) and row["n_neg"] == len(neg)
    # O(n_pos * n_neg) literal Mann-Whitney on the small fixture
    wins = sum(1.0 if p > n else 0.5 if p == n else 0.0 for p in pos for n in neg)
    assert row["auc"] == pytest.approx(wins / (len(pos) * len(neg)), abs=1e-6)
    assert 0.5 < row["auc"] <= 1.0, "quality score should beat a coin flip"


def test_frequent_sequences_matches_bruteforce(spark, sf_dir):
    from gcp_cloudsql_airflow_bigquery_spark.catalog import load_table

    out = events.events_frequent_sequences(spark, sf_dir).collect()
    assert 0 < len(out) <= 20
    ev = (
        load_table(spark, sf_dir, "events")
        .select("user_id", "ts", "event_id", "event_type")
        .collect()
    )
    streams = defaultdict(list)
    for r in ev:
        streams[r["user_id"]].append((r["ts"], r["event_id"], r["event_type"]))
    support = defaultdict(set)
    for uid, s in streams.items():
        s.sort()
        types = [x[2] for x in s]
        for i in range(len(types) - 2):
            support[tuple(types[i : i + 3])].add(uid)
    ranked = sorted(
        ((len(u), t) for t, u in support.items()),
        key=lambda x: (-x[0], x[1]),
    )[:20]
    got = [(r["support"], (r["t1"], r["t2"], r["t3"])) for r in out]
    assert sorted(got, key=lambda x: (-x[0], x[1])) == ranked


def test_sliding_distinct_sketch_consistency(spark, sf_dir):
    """Every 3-day sliding estimate must be >= its own day's rollup
    estimate (a window contains its end day) and the window count must
    cover every (type, day) plus the two trailing phantom windows."""
    from pyspark.sql import functions as F

    from gcp_cloudsql_airflow_bigquery_spark.catalog import load_table
    from gcp_cloudsql_airflow_bigquery_spark.plans import scale

    out = scale.events_sliding_distinct_users(spark, sf_dir)
    daily_exact = (
        load_table(spark, sf_dir, "events")
        .groupBy("event_type", F.to_date("ts").alias("w_end"))
        .agg(F.count_distinct("user_id").alias("exact_day"))
    )
    j = out.join(daily_exact, ["event_type", "w_end"], "inner").collect()
    assert j
    for r in j:
        assert r["distinct_users_3d"] >= r["exact_day"]


def test_linkage_weights_monotone_per_field(spark, sf_dir):
    """Flipping any single field from disagree to agree (others held
    fixed) must strictly raise the match weight — i.e. every field's
    agree-weight exceeds its disagree-weight (m > u holds for all
    three fields on this data).  Weights are constant per agreement
    pattern, so each observed pattern maps to exactly one weight."""
    from gcp_cloudsql_airflow_bigquery_spark.plans import advanced

    rows = advanced.customer_linkage_scores(spark, sf_dir).collect()
    assert rows
    fields = ("agree_name", "agree_nation", "agree_segment")
    by_pattern = {}
    for r in rows:
        pat = tuple(bool(r[c]) for c in fields)
        w = by_pattern.setdefault(pat, r["match_weight"])
        assert w == pytest.approx(r["match_weight"], abs=1e-9), pat
    for pat, w in by_pattern.items():
        for i in range(len(fields)):
            if not pat[i]:
                flipped = pat[:i] + (True,) + pat[i + 1 :]
                if flipped in by_pattern:
                    assert by_pattern[flipped] > w, (pat, flipped)


def test_forecast_eval_metric_inequalities(spark, sf_dir):
    rows = events.events_forecast_eval(spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert r["rmse"] >= r["mae"] - 1e-9  # Cauchy-Schwarz
        assert 0.0 <= r["smape"] <= 2.0
        assert r["n_hours_eval"] > 0


def test_ngram_novelty_is_nonnegative(spark, sf_dir):
    """KL(doc || corpus) >= 0 (Gibbs' inequality) for every doc, and
    every non-empty doc is scored."""
    from pyspark.sql import functions as F

    from gcp_cloudsql_airflow_bigquery_spark.catalog import load_table
    from gcp_cloudsql_airflow_bigquery_spark.plans import llmdata

    out = llmdata.doc_ngram_novelty(spark, sf_dir)
    rows = out.collect()
    n_docs = (
        load_table(spark, sf_dir, "documents")
        .filter(F.trim(F.col("text")) != "")
        .count()
    )
    assert len(rows) == n_docs
    assert all(r["kl_novelty"] >= -1e-6 for r in rows)
    assert max(r["kl_novelty"] for r in rows) > 0


def test_benford_chi2_matches_reference(spark, sf_dir):
    import math

    from gcp_cloudsql_airflow_bigquery_spark.catalog import load_table
    from gcp_cloudsql_airflow_bigquery_spark.plans import advanced

    rows = advanced.orders_benford_screen(spark, sf_dir).collect()
    assert rows
    orders = load_table(spark, sf_dir, "orders").collect()
    by_p = defaultdict(lambda: defaultdict(int))
    for r in orders:
        if r["o_totalprice"] >= 1:
            d = int(f"{r['o_totalprice']:.2f}"[0])
            by_p[r["o_orderpriority"]][d] += 1
    for r in rows:
        cnt = by_p[r["o_orderpriority"]]
        n = sum(cnt.values())
        assert r["n_orders"] == n
        chi2 = sum(
            (cnt.get(d, 0) / n - math.log10(1 + 1 / d)) ** 2
            / math.log10(1 + 1 / d)
            for d in range(1, 10)
        ) * n
        assert r["chi2"] == pytest.approx(chi2, abs=1e-3)
        assert r["benford_ok"] == (r["chi2"] <= 20.09)


def test_gini_matches_sorted_reference(spark, sf_dir):
    from gcp_cloudsql_airflow_bigquery_spark.catalog import load_table
    from gcp_cloudsql_airflow_bigquery_spark.plans import advanced

    row = advanced.customer_revenue_gini(spark, sf_dir).collect()[0]
    rev = defaultdict(float)
    for r in load_table(spark, sf_dir, "orders").collect():
        rev[r["o_custkey"]] += round(r["o_totalprice"], 2)
    xs = sorted(rev.values())
    n = len(xs)
    assert row["n_customers"] == n
    gini = 2 * sum((i + 1) * x for i, x in enumerate(xs)) / (n * sum(xs)) - (
        n + 1
    ) / n
    assert row["gini"] == pytest.approx(gini, abs=1e-5)
    assert 0.0 <= row["gini"] < 1.0


def test_readability_matches_reference(spark, sf_dir):
    import re

    from gcp_cloudsql_airflow_bigquery_spark.catalog import load_table

    rows = {
        r["doc_id"]: r
        for r in quality.doc_readability(spark, sf_dir).collect()
    }
    docs = load_table(spark, sf_dir, "documents").collect()
    checked = 0
    for d in docs:
        t = d["text"]
        words = len(t.split())
        if words == 0:
            assert d["doc_id"] not in rows
            continue
        sents = max(len(re.findall(r"[.!?]+", t)), 1)
        syll = len(re.findall(r"[aeiouy]+", t.lower()))
        r = rows[d["doc_id"]]
        assert (r["n_words"], r["n_sentences"], r["n_syllables"]) == (
            words,
            sents,
            syll,
        )
        expect = 206.835 - 1.015 * words / sents - 84.6 * syll / words
        assert r["flesch"] == pytest.approx(expect, abs=1e-3)
        checked += 1
    assert checked == len(rows)


def test_embedding_outlier_score_matches_reference(spark, sf_dir):
    import math

    from gcp_cloudsql_airflow_bigquery_spark.catalog import load_table
    from gcp_cloudsql_airflow_bigquery_spark.plans import llmdata

    rows = {
        r["vec_id"]: r
        for r in llmdata.embedding_outlier_score(spark, sf_dir).collect()
    }
    emb = load_table(spark, sf_dir, "embeddings").collect()
    vecs = {r["vec_id"]: [float(x) for x in r["embedding"]] for r in emb}
    d = len(next(iter(vecs.values())))
    n = len(vecs)
    mu = [sum(v[i] for v in vecs.values()) / n for i in range(d)]
    sigma = [
        math.sqrt(
            sum((v[i] - mu[i]) ** 2 for v in vecs.values()) / (n - 1)
        )
        for i in range(d)
    ]
    assert set(rows) == set(vecs)
    for vid, v in vecs.items():
        m2 = sum(((v[i] - mu[i]) / sigma[i]) ** 2 for i in range(d))
        assert rows[vid]["m2"] == pytest.approx(m2, abs=1e-3)
        assert rows[vid]["is_outlier"] == (rows[vid]["m2"] > 104.72)


def test_zipf_fit_matches_reference(spark, sf_dir):
    import math
    from collections import Counter

    from gcp_cloudsql_airflow_bigquery_spark.catalog import load_table
    from gcp_cloudsql_airflow_bigquery_spark.plans import llmdata

    row = llmdata.doc_zipf_fit(spark, sf_dir).collect()[0]
    cnt = Counter()
    for r in load_table(spark, sf_dir, "documents").collect():
        t = r["text"].strip().lower()
        if t:
            cnt.update(t.split())
    ranked = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))
    assert row["vocab_size"] == len(ranked)
    xs = [math.log(i + 1) for i in range(len(ranked))]
    ys = [math.log(c) for _, c in ranked]
    n = len(xs)
    mx, my = sum(xs) / n, sum(ys) / n
    sxx = sum((x - mx) ** 2 for x in xs)
    sxy = sum((x - mx) * (y - my) for x, y in zip(xs, ys))
    syy = sum((y - my) ** 2 for y in ys)
    slope = sxy / sxx
    r2 = sxy * sxy / (sxx * syy)
    assert row["zipf_exponent"] == pytest.approx(slope, abs=1e-4)
    assert row["r2"] == pytest.approx(r2, abs=1e-4)
    assert row["zipf_exponent"] < 0, "frequency must fall with rank"
