"""Differential tests for the round-7 wave-11..18 operators: each
Spark plan is replayed by a small pure-Python reference (dict-of-counts
k-anonymity, sequential gap statistics, textbook PSI sum, PQ Lloyd,
greedy MMR / k-center, the stupid-backoff ladder, nDCG, RAKE, TextRank
power iteration, transition conformance) on the collected fixture rows
— proving the intended ALGORITHM on top of the DuckDB oracles'
cross-engine agreement.  Hypothesis sections add randomized invariants
(PQ training monotonicity, Misra-Gries guarantees)."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import pytest

from gcp_cloudsql_airflow_bigquery_spark.catalog import load_table
from gcp_cloudsql_airflow_bigquery_spark.plans import dq, events, llmdata


def test_k_anonymity_matches_counting_reference(spark, sf_dir):
    out = {r["k_threshold"]: r for r in dq.customer_k_anonymity(spark, sf_dir).collect()}
    assert sorted(out) == [2, 5, 10, 25]
    classes: Counter = Counter()
    sens: defaultdict = defaultdict(set)
    n_rows = 0
    for r in load_table(spark, sf_dir, "customer").collect():
        qi = (r["c_nationkey"], math.floor(r["c_acctbal"] / 1000.0))
        classes[qi] += 1
        sens[qi].add(r["c_mktsegment"])
        n_rows += 1
    for k, r in out.items():
        at_risk = {qi: c for qi, c in classes.items() if c < k}
        assert r["classes_at_risk"] == len(at_risk)
        assert r["rows_at_risk"] == sum(at_risk.values())
        assert r["pct_rows_at_risk"] == pytest.approx(
            round(sum(at_risk.values()) / n_rows, 6), abs=1e-9
        )
        expect_l = min((len(sens[qi]) for qi in at_risk), default=None)
        assert r["worst_l_diversity"] == expect_l
        assert r["n_classes"] == len(classes)
        assert r["n_rows"] == n_rows
        assert r["min_class_size"] == min(classes.values())


def test_bot_regularity_matches_sequential_reference(spark, sf_dir):
    out = {r["user_id"]: r for r in events.events_bot_regularity(spark, sf_dir).collect()}
    assert out
    by_user: defaultdict = defaultdict(list)
    for r in load_table(spark, sf_dir, "events").collect():
        by_user[r["user_id"]].append((r["ts"], r["event_id"]))
    for uid, evs in by_user.items():
        if len(evs) < 20:
            assert uid not in out
            continue
        evs.sort()
        gaps = [
            (b[0] - a[0]).total_seconds() for a, b in zip(evs, evs[1:])
        ]
        mean = sum(gaps) / len(gaps)
        sd = math.sqrt(sum((g - mean) ** 2 for g in gaps) / len(gaps))
        r = out[uid]
        assert r["n_events"] == len(evs)
        assert r["mean_gap_s"] == pytest.approx(round(mean, 4), abs=1e-3)
        cv = round(sd / mean, 4) if mean else None
        assert r["gap_cv"] == pytest.approx(cv, abs=1e-3)
        span_days = (evs[-1][0] - evs[0][0]).total_seconds() / 86_400
        assert r["events_per_day"] == pytest.approx(
            round(len(evs) / span_days, 4), abs=1e-3
        )
        assert r["bot_flag"] == bool(cv is not None and cv < 0.3 and len(evs) >= 50)


def test_psi_drift_matches_textbook_sum(spark, sf_dir):
    out = {r["source"]: r for r in llmdata.doc_source_psi_drift(spark, sf_dir).collect()}
    assert out
    ref: Counter = Counter()
    per_src: defaultdict = defaultdict(Counter)
    for r in load_table(spark, sf_dir, "documents").collect():
        b = min(9, r["n_chars"] // 64)
        ref[b] += 1
        per_src[r["source"]][b] += 1
    n_ref = sum(ref.values())
    for src, cnt in per_src.items():
        n = sum(cnt.values())
        psi = sum(
            ((cnt.get(b, 0) + 0.5) / (n + 5.0) - (ref.get(b, 0) + 0.5) / (n_ref + 5.0))
            * math.log(
                ((cnt.get(b, 0) + 0.5) / (n + 5.0))
                / ((ref.get(b, 0) + 0.5) / (n_ref + 5.0))
            )
            for b in range(10)
        )
        r = out[src]
        assert r["n_rows"] == n
        assert r["psi"] == pytest.approx(round(psi, 6), abs=1e-5)
        assert r["drift_flag"] == (r["psi"] > 0.2)
        assert r["psi"] >= -1e-9  # PSI is a sum of nonneg KL-style terms


def test_pq_matches_pure_python_lloyd(spark, sf_dir):
    """Replay pq_build's deterministic training (init = 16 smallest
    ids' subvectors, 2 plain-L2 Lloyd rounds, first-min tie-break,
    empty cells keep centroids) in pure Python and check codes and
    reconstruction errors row-for-row."""
    from gcp_cloudsql_airflow_bigquery_spark.operators import similarity

    emb = load_table(spark, sf_dir, "embeddings")
    rows = sorted(
        ((r["vec_id"], [float(x) for x in r["embedding"]]) for r in emb.collect())
    )
    m, ks, sub_dim = 8, 16, len(rows[0][1]) // 8
    subs = {
        (vid, s): vec[s * sub_dim : (s + 1) * sub_dim] for vid, vec in rows for s in range(m)
    }
    books = [
        [rows[c][1][s * sub_dim : (s + 1) * sub_dim] for c in range(ks)]
        for s in range(m)
    ]

    def d2(a, b):
        return sum((x - y) ** 2 for x, y in zip(a, b))

    def argmin(sv, cb):
        ds = [d2(sv, c) for c in cb]
        return ds.index(min(ds))

    for _ in range(2):
        members: defaultdict = defaultdict(list)
        for (vid, s), sv in subs.items():
            members[(s, argmin(sv, books[s]))].append(sv)
        books = [
            [
                [sum(v[p] for v in mem) / len(mem) for p in range(sub_dim)]
                if (mem := members.get((s, c)))
                else books[s][c]
                for c in range(ks)
            ]
            for s in range(m)
        ]
    expect = {}
    for vid, vec in rows:
        code, err2 = 0, 0.0
        for s in range(m):
            cl = argmin(subs[(vid, s)], books[s])
            code |= cl << (4 * s)
            err2 += d2(subs[(vid, s)], books[s][cl])
        expect[vid] = (code, round(math.sqrt(err2), 6))

    got = {
        r["vec_id"]: (r["pq_code"], r["recon_err"])
        for r in llmdata.embedding_pq_codes(spark, sf_dir).collect()
    }
    assert got.keys() == expect.keys()
    n_code_match = sum(got[v][0] == expect[v][0] for v in got)
    # argmin near-ties may flip a rare subspace code between float
    # summation orders; demand near-total agreement, exact err where
    # codes agree
    assert n_code_match >= len(got) - 1, f"{len(got) - n_code_match} code mismatches"
    for v in got:
        if got[v][0] == expect[v][0]:
            assert got[v][1] == pytest.approx(expect[v][1], abs=2e-6)

    # 4-bit packing invariant: every unpacked field is a valid cluster
    for code, _ in got.values():
        for s in range(m):
            assert 0 <= (code >> (4 * s)) & 0xF < ks

    with pytest.raises(ValueError):
        similarity.pq_encode(emb, [[[0.0]] * 17])


def test_mmr_matches_pure_python_greedy(spark, sf_dir):
    """Replay the unrolled greedy MMR (lam=0.7, round-6 scores,
    cand_id tie-break) in pure Python from the same brute-force
    top-25 pool and check every pick and score."""
    from gcp_cloudsql_airflow_bigquery_spark.plans import search

    got = defaultdict(dict)
    for r in search.embedding_mmr_diverse(spark, sf_dir).collect():
        got[r["query_id"]][r["pick"]] = (r["cand_id"], r["mmr_score"])
    emb = {
        r["vec_id"]: [float(x) for x in r["embedding"]]
        for r in load_table(spark, sf_dir, "embeddings").collect()
    }

    def cos(a, b):
        dot = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return dot / (na * nb)

    lam = 0.7
    for qid in range(5):
        rels = sorted(
            ((round(cos(emb[qid], v), 6), cid) for cid, v in emb.items() if cid != qid),
            key=lambda t: (-t[0], t[1]),
        )[:25]
        pool = {cid: rel for rel, cid in rels}
        # pick 1 = max rel, cand_id tie-break
        sel = [sorted(pool.items(), key=lambda t: (-t[1], t[0]))[0]]
        for pick in range(2, 11):
            scored = []
            for cid, rel in pool.items():
                if cid in {c for c, _ in sel}:
                    continue
                ms = max(cos(emb[cid], emb[sc]) for sc, _ in sel)
                scored.append((cid, round(lam * rel - (1 - lam) * ms, 6)))
            scored.sort(key=lambda t: (-t[1], t[0]))
            sel.append(scored[0])
        assert sorted(got[qid]) == list(range(1, 11))
        for pick, (cid, score) in enumerate(sel, start=1):
            gcid, gscore = got[qid][pick]
            assert gcid == cid, (qid, pick)
            expect = round(pool[cid], 6) if pick == 1 else score
            assert gscore == pytest.approx(expect, abs=2e-6), (qid, pick)
        # diversification sanity: no candidate picked twice
        assert len({c for c, _ in sel}) == 10


def test_pq_adc_recall_and_shortlist(spark, sf_dir):
    """PQ-ADC quality contract on the worst-case (random, clusterless)
    fixture: direct ADC top-10 keeps a measurable fraction of the
    exact top-10, and the production composition — ADC shortlist 100 +
    exact rerank — recovers nearly all of it (measured 0.94 at sf0.01,
    0.3 direct)."""
    from pyspark.sql import functions as F

    from gcp_cloudsql_airflow_bigquery_spark.operators import similarity

    emb = load_table(spark, sf_dir, "embeddings")
    probes = emb.filter(F.col("vec_id") < 5)
    truth = {
        (r.query_id, r.neighbor_id)
        for r in similarity.brute_force_topk(emb, probes, k=10).collect()
    }
    cb = similarity.pq_build(emb, m=8, ks=16, iters=2)
    direct = {
        (r.query_id, r.neighbor_id)
        for r in similarity.pq_adc_topk(emb, probes, cb, k=10).collect()
    }
    assert len(truth & direct) / len(truth) >= 0.2
    shortlist = {
        (r.query_id, r.neighbor_id)
        for r in similarity.pq_adc_topk(emb, probes, cb, k=100).collect()
    }
    assert len(truth & shortlist) / len(truth) >= 0.8
    # ADC distance is a true distance to the reconstruction: it must
    # equal sqrt(sum of the per-sub table entries), already covered by
    # the oracle; here pin ranks are 1..10 per query and deterministic
    per_q = defaultdict(list)
    for r in similarity.pq_adc_topk(emb, probes, cb, k=10).collect():
        per_q[r.query_id].append(r.rank)
    for q, ranks in per_q.items():
        assert sorted(ranks) == list(range(1, 11)), q


def test_backoff_lm_matches_pure_python_ladder(spark, sf_dir):
    """Replay the 75/25 md5 split, the train count tables, and the
    stupid-backoff scoring ladder in pure Python; check each held-out
    doc's hit counts and mean score."""
    import hashlib

    out = {r["doc_id"]: r for r in llmdata.doc_backoff_lm_eval(spark, sf_dir).collect()}
    docs = [
        (r["doc_id"], r["text"].strip().lower().split())
        for r in load_table(spark, sf_dir, "documents").collect()
        if r["text"] and r["text"].strip()
    ]
    train_set = {
        d
        for d, _ in docs
        if hashlib.md5(str(d).encode()).hexdigest()[0] in "0123456789ab"
    }
    c3: Counter = Counter()
    c2: Counter = Counter()
    c1: Counter = Counter()
    for d, w in docs:
        if d not in train_set:
            continue
        c1.update(w)
        c2.update(zip(w, w[1:]))
        c3.update(zip(w, w[1:], w[2:]))
    n_total, v1 = sum(c1.values()), len(c1)
    n_held_docs = 0
    for d, w in docs:
        if d in train_set or len(w) < 3:
            if d not in train_set:
                assert d not in out or len(w) >= 3
            continue
        n_held_docs += 1
        nlls, tri_hits, bi_hits = [], 0, 0
        for g in zip(w, w[1:], w[2:]):
            if g in c3:
                tri_hits += 1
                s = c3[g] / c2[(g[0], g[1])]
            elif (g[1], g[2]) in c2:
                bi_hits += 1
                s = 0.4 * c2[(g[1], g[2])] / c1[g[1]]
            else:
                s = 0.16 * (c1.get(g[2], 0) + 1) / (n_total + v1)
            nlls.append(-math.log(s))
        r = out[d]
        assert r["n_trigrams"] == len(nlls)
        assert r["n_tri_hits"] == tri_hits
        assert r["n_bi_hits"] == bi_hits
        mean = sum(nlls) / len(nlls)
        assert r["avg_neg_logscore"] == pytest.approx(round(mean, 6), abs=1e-5)
        assert r["sb_ppl"] == pytest.approx(round(math.exp(mean), 6), rel=1e-4)
    assert n_held_docs == len(out) and n_held_docs > 0


def test_duplicate_purchases_matches_sequential_reference(spark, sf_dir):
    """Replay the (user, whole-unit band) LAG screen sequentially in
    Python: every flagged pair is a true consecutive same-band pair
    within 48h, and none is missed."""
    rows = [
        r
        for r in load_table(spark, sf_dir, "events").collect()
        if r["event_type"] == "purchase"
    ]
    by_key: defaultdict = defaultdict(list)
    for r in rows:
        by_key[(r["user_id"], math.floor(r["value"]))].append(
            (r["ts"], r["event_id"], r["value"])
        )
    expect = set()
    for (uid, band), evs in by_key.items():
        evs.sort()
        for a, b in zip(evs, evs[1:]):
            gap_us = int((b[0] - a[0]).total_seconds() * 1_000_000)
            if gap_us <= 48 * 3_600_000_000:
                expect.add((uid, band, a[1], b[1], gap_us))
    got = {
        (r["user_id"], r["band"], r["first_event_id"], r["second_event_id"], r["gap_us"])
        for r in events.events_duplicate_purchases(spark, sf_dir).collect()
    }
    assert got == expect
    assert expect  # the fixture produces at least one flagged pair


def test_ndcg_eval_matches_pure_python_formula(spark, sf_dir):
    """Replay nDCG@10 in pure Python from the two retrieval outputs
    (which carry their own oracles) and pin range invariants."""
    from pyspark.sql import functions as F

    from gcp_cloudsql_airflow_bigquery_spark.operators.similarity import (
        brute_force_topk,
    )
    from gcp_cloudsql_airflow_bigquery_spark.operators.textsearch import bm25_topk
    from gcp_cloudsql_airflow_bigquery_spark.plans import search

    out = {r["query_id"]: r for r in search.search_ndcg_eval(spark, sf_dir).collect()}
    assert set(out) == {0, 7, 13}
    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    qd = docs.filter(F.col("doc_id").isin(0, 7, 13)).select(
        F.col("doc_id").alias("query_id"), F.col("text").alias("query_text")
    )
    text = sorted(
        (
            (r["query_id"], -r["score"], r["doc_id"])
            for r in bm25_topk(docs, qd, k=11).collect()
            if r["doc_id"] != r["query_id"]
        )
    )
    gold = {}
    for r in brute_force_topk(
        emb, emb.filter(F.col("vec_id").isin(0, 7, 13)), k=25
    ).collect():
        g = 3 if r["rank"] <= 5 else 2 if r["rank"] <= 10 else 1
        gold[(r["query_id"], r["neighbor_id"])] = g
    for qid in (0, 7, 13):
        ranked = [d for q, _, d in text if q == qid][:10]
        dcg = sum(
            (2 ** gold.get((qid, d), 0) - 1) / math.log2(pos + 2)
            for pos, d in enumerate(ranked)
        )
        grades = sorted(
            (g for (q, _), g in gold.items() if q == qid), reverse=True
        )[:10]
        idcg = sum(
            (2**g - 1) / math.log2(pos + 2) for pos, g in enumerate(grades)
        )
        r = out[qid]
        assert r["dcg_at_10"] == pytest.approx(round(dcg, 6), abs=1e-5)
        assert r["idcg_at_10"] == pytest.approx(round(idcg, 6), abs=1e-5)
        assert r["ndcg_at_10"] == pytest.approx(round(dcg / idcg, 6), abs=1e-5)
        assert 0.0 <= r["ndcg_at_10"] <= 1.0
        assert r["n_graded_hits"] == sum(1 for d in ranked if (qid, d) in gold)


def test_kcenter_matches_pure_python_greedy(spark, sf_dir):
    """Replay greedy farthest-point selection (round-6 min-dists, id
    tie-breaks) in pure Python; also pin the defining invariant: each
    pick's min-distance-to-prior is non-increasing."""
    emb = {
        r["vec_id"]: [float(x) for x in r["embedding"]]
        for r in load_table(spark, sf_dir, "embeddings").collect()
    }
    sel = [min(emb)]
    dists = [None]
    for _ in range(9):
        # farthest point: max rounded min-dist, tie -> smallest id
        cands = []
        for vid, v in emb.items():
            if vid in sel:
                continue
            md = round(
                min(sum((x - y) ** 2 for x, y in zip(v, emb[s])) for s in sel), 6
            )
            cands.append((-md, vid))
        cands.sort()
        sel.append(cands[0][1])
        dists.append(-cands[0][0])
    got = sorted(
        (r["pick"], r["vec_id"], r["min_dist_sq"])
        for r in llmdata.embedding_kcenter_coreset(spark, sf_dir).collect()
    )
    assert [g[1] for g in got] == sel
    for (pick, vid, md), expect in zip(got, dists):
        if expect is None:
            assert md is None
        else:
            assert md == pytest.approx(expect, abs=2e-6)
    picked_d = [g[2] for g in got if g[2] is not None]
    assert all(a >= b - 1e-9 for a, b in zip(picked_d, picked_d[1:]))


def test_ivfpq_consistent_with_components(spark, sf_dir):
    """IVF-PQ = PQ-ADC restricted to IVF-probed cells: every IVF-PQ
    result appears in the unrouted ADC ranking of the same query with
    the SAME distance, and every ADC top-k candidate that lives in a
    probed cell survives routing."""
    from pyspark.sql import functions as F

    from gcp_cloudsql_airflow_bigquery_spark.operators import similarity

    emb = load_table(spark, sf_dir, "embeddings")
    probes = emb.filter(F.col("vec_id") < 5)
    centroids = similarity.ivf_build(emb, 16, 2)
    codebooks = similarity.pq_build(emb, m=8, ks=16, iters=2)
    cells = {
        r["cand_id"]: r["cell"]
        for r in emb.select(
            F.col("vec_id").alias("cand_id"),
            similarity.ivf_assign(
                similarity._normalize(similarity._as_double("embedding")),
                centroids,
            ).alias("cell"),
        ).collect()
    }
    probed = defaultdict(set)
    for r in similarity.ivfpq_topk(emb, probes, k=10).collect():
        probed[r["query_id"]].add((r["neighbor_id"], r["adc_dist"]))
    assert set(probed) == {0, 1, 2, 3, 4}
    full = defaultdict(dict)
    for r in similarity.pq_adc_topk(emb, probes, codebooks, k=10_000).collect():
        full[r["query_id"]][r["neighbor_id"]] = r["adc_dist"]
    for q, pairs in probed.items():
        assert len(pairs) == 10
        for nid, d in pairs:
            assert full[q][nid] == d, (q, nid)


from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as hst  # noqa: E402


@given(
    hst.lists(
        hst.lists(
            hst.floats(min_value=-4.0, max_value=4.0, width=32),
            min_size=8,
            max_size=8,
        ),
        min_size=6,
        max_size=24,
        unique_by=tuple,
    )
)
@settings(max_examples=6, deadline=None)
def test_pq_invariants_hypothesis(spark, vecs):
    """Random tiny corpora: codes stay in range, reconstruction error
    is nonneg, and two Lloyd rounds never give a WORSE total
    distortion than zero rounds (training monotonicity of k-means on
    the same init)."""
    from gcp_cloudsql_airflow_bigquery_spark.operators import similarity

    df = spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<double>",
    )
    m, ks = 4, 4
    trained = similarity.pq_build(df, m=m, ks=ks, iters=2)
    init = similarity.pq_build(df, m=m, ks=ks, iters=0)
    err = {
        it: sum(
            r["recon_err"] ** 2
            for r in similarity.pq_encode(df, cb).collect()
        )
        for it, cb in (("trained", trained), ("init", init))
    }
    assert err["trained"] <= err["init"] + 1e-6
    for r in similarity.pq_encode(df, trained).collect():
        assert r["recon_err"] >= 0
        for s in range(m):
            assert 0 <= (r["pq_code"] >> (4 * s)) & 0xF < ks


@given(
    hst.lists(hst.integers(min_value=0, max_value=9), min_size=1, max_size=200),
    hst.integers(min_value=2, max_value=6),
)
@settings(max_examples=20, deadline=None)
def test_misra_gries_kernel_guarantee_hypothesis(stream, k):
    """The MG kernel (as the streaming operator runs it) satisfies
    both guarantees on arbitrary streams — no Spark needed: drive the
    pandas kernel directly with a fake GroupState."""
    import pandas as pd

    from gcp_cloudsql_airflow_bigquery_spark.streaming.streams import _make_mg_fn

    class FakeState:
        exists = False

        def update(self, v):
            self.value = v

        @property
        def get(self):
            return self.value

    st = FakeState()
    pdf = pd.DataFrame(
        {"order_us": range(len(stream)), "item": stream}
    )
    (out,) = list(_make_mg_fn(k)(("t",), iter([pdf]), st))
    est = dict(zip(out["item"], out["est_count"]))
    n = len(stream)
    exact = Counter(stream)
    bound = n / (k + 1)
    assert len(est) <= k
    for item, c in exact.items():
        if c > bound:
            assert item in est, (item, c, bound, k)
        if item in est:
            assert c - bound <= est[item] <= c


def test_tokenizer_fertility_consistent_with_bpe_tokens(spark, sf_dir):
    """Fertility must be exactly the ratio of the per-doc BPE token
    sums (already differential-tested) to whitespace word counts,
    aggregated per source — and every fertility >= 1 (BPE never emits
    fewer tokens than words)."""
    per_doc = {
        r["doc_id"]: r["n_bpe_tokens"]
        for r in llmdata.doc_bpe_tokens(spark, sf_dir).collect()
    }
    words = {}
    src = {}
    for r in load_table(spark, sf_dir, "documents").collect():
        t = " ".join((r["text"] or "").lower().split())
        if t:
            words[r["doc_id"]] = len(t.split(" "))
            src[r["doc_id"]] = r["source"]
    agg: defaultdict = defaultdict(lambda: [0, 0, 0])
    for d, nb in per_doc.items():
        a = agg[src[d]]
        a[0] += 1
        a[1] += nb
        a[2] += words[d]
    out = {r["source"]: r for r in llmdata.doc_tokenizer_fertility(spark, sf_dir).collect()}
    assert out.keys() == agg.keys()
    for s, (nd, nb, nw) in agg.items():
        r = out[s]
        assert (r["n_docs"], r["n_bpe_tokens"], r["n_words"]) == (nd, nb, nw)
        assert r["fertility"] == pytest.approx(round(nb / nw, 6), abs=1e-9)
        assert r["fertility"] >= 1.0


def test_rake_matches_pure_python_reference(spark, sf_dir):
    """Replay RAKE (stopword islands, degree/frequency word scores,
    phrase sums, round-6 argmax with phrase tie-break) in pure Python
    for every document."""
    from gcp_cloudsql_airflow_bigquery_spark.operators.textstats import STOPWORDS

    stops = set(STOPWORDS)
    out = {
        r["doc_id"]: (r["phrase"], r["n_words"], r["score"])
        for r in llmdata.doc_rake_keyphrases(spark, sf_dir).collect()
    }
    n_checked = 0
    for r in load_table(spark, sf_dir, "documents").collect():
        toks = (r["text"] or "").lower().split()
        phrases, cur = [], []
        for w in toks:
            if w in stops:
                if cur:
                    phrases.append(cur)
                cur = []
            else:
                cur.append(w)
        if cur:
            phrases.append(cur)
        if not phrases:
            assert r["doc_id"] not in out
            continue
        n_checked += 1
        freq: Counter = Counter()
        deg: Counter = Counter()
        for p in phrases:
            for w in p:
                freq[w] += 1
                deg[w] += len(p)
        best = {}
        for p in phrases:
            txt = " ".join(p)
            score = round(sum(deg[w] / freq[w] for w in p), 6)
            best[txt] = (score, len(p))
        top = sorted(best.items(), key=lambda kv: (-kv[1][0], kv[0]))[0]
        got = out[r["doc_id"]]
        assert got[0] == top[0], r["doc_id"]
        assert got[1] == top[1][1]
        assert got[2] == pytest.approx(top[1][0], abs=2e-6)
    assert n_checked == len(out) and n_checked > 0


def test_transition_conformance_matches_sequential_reference(spark, sf_dir):
    from gcp_cloudsql_airflow_bigquery_spark.plans.events import (
        _ALLOWED_TRANSITIONS,
    )

    allowed = set(_ALLOWED_TRANSITIONS)
    by_user: defaultdict = defaultdict(list)
    for r in load_table(spark, sf_dir, "events").collect():
        by_user[r["user_id"]].append((r["ts"], r["event_id"], r["event_type"]))
    out = {
        r["user_id"]: r
        for r in events.events_transition_conformance(spark, sf_dir).collect()
    }
    for uid, evs in by_user.items():
        evs.sort()
        pairs = [(a[2], b[2]) for a, b in zip(evs, evs[1:])]
        if not pairs:
            assert uid not in out
            continue
        viol = sum(1 for p in pairs if p not in allowed)
        r = out[uid]
        assert r["n_transitions"] == len(pairs)
        assert r["n_violations"] == viol
        assert r["violation_rate"] == pytest.approx(
            round(viol / len(pairs), 6), abs=1e-9
        )
        assert r["nonconforming"] == (r["violation_rate"] > 0.5)


def test_textrank_matches_pure_python_power_iteration(spark, sf_dir):
    """Replay the 2-round damped power iteration over the doc-local
    sentence-overlap graph in pure Python for every document."""
    import re

    out = {
        r["doc_id"]: (r["sent_idx"], r["sentence"], r["n_sentences"], r["score"])
        for r in llmdata.doc_textrank_sentence(spark, sf_dir).collect()
    }
    d = 0.85
    n_checked = 0
    for r in load_table(spark, sf_dir, "documents").collect():
        sents = [s.strip() for s in re.split(r"[.!?]+", r["text"] or "")]
        sw = [
            (i, s, set(re.split(r"\s+", s.lower())))
            for i, s in enumerate(sents)
            if s
        ]
        if not sw:
            assert r["doc_id"] not in out
            continue
        n_checked += 1
        n = len(sw)
        edges: defaultdict = defaultdict(dict)
        for ia, _, wa in sw:
            for ib, _, wb in sw:
                if ia == ib:
                    continue
                ov = len(wa & wb)
                if ov:
                    edges[ia][ib] = ov / (len(wa) + len(wb))
        out_w = {i: sum(ws.values()) for i, ws in edges.items()}
        s = {i: 1.0 / n for i, _, _ in sw}
        for _ in range(2):
            nxt = {}
            for i, _, _ in sw:
                c = sum(
                    edges[j][i] * s[j] / out_w[j]
                    for j in edges
                    if i in edges[j]
                )
                nxt[i] = (1 - d) / n + d * c
            s = nxt
        best = sorted(((round(v, 6), -i) for i, v in s.items()), reverse=True)[0]
        idx = -best[1]
        got = out[r["doc_id"]]
        assert got[0] == idx, r["doc_id"]
        assert got[1] == dict((i, t) for i, t, _ in sw)[idx]
        assert got[2] == n
        assert got[3] == pytest.approx(best[0], abs=2e-6)
    assert n_checked == len(out) and n_checked > 0


def test_textrank_synthetic_multisentence_graph(spark):
    """The fixture corpus has no sentence punctuation (each doc is one
    sentence, a trivial graph), so exercise the REAL power iteration
    on a synthetic doc: the hub sentence sharing words with every
    other sentence must win, and scores must match the pure-Python
    iteration."""
    from gcp_cloudsql_airflow_bigquery_spark.operators.textstats import (
        textrank_top_sentence,
    )

    text = (
        "alpha beta gamma. alpha delta zeta! beta delta eta? "
        "theta iota kappa. alpha beta delta theta."
    )
    df = spark.createDataFrame([(1, text), (2, "solo sentence")], ["doc_id", "text"])
    out = {r["doc_id"]: r for r in textrank_top_sentence(df).collect()}
    # doc 2: single sentence wins with the base score (1-d)/1
    assert out[2]["sentence"] == "solo sentence"
    assert out[2]["n_sentences"] == 1
    assert out[2]["score"] == pytest.approx(0.15, abs=1e-6)
    # doc 1: the hub sentence overlaps all four others
    assert out[1]["n_sentences"] == 5
    assert out[1]["sentence"] == "alpha beta delta theta"
    # pure-python replay of the same 2-round iteration
    import re

    sents = [s.strip() for s in re.split(r"[.!?]+", text) if s.strip()]
    sw = [(i, set(s.lower().split())) for i, s in enumerate(sents)]
    n, d = len(sw), 0.85
    edges: defaultdict = defaultdict(dict)
    for ia, wa in sw:
        for ib, wb in sw:
            if ia != ib and wa & wb:
                edges[ia][ib] = len(wa & wb) / (len(wa) + len(wb))
    out_w = {i: sum(v.values()) for i, v in edges.items()}
    s = {i: 1 / n for i, _ in sw}
    for _ in range(2):
        s = {
            i: (1 - d) / n
            + d * sum(edges[j][i] * s[j] / out_w[j] for j in edges if i in edges[j])
            for i, _ in sw
        }
    best_idx, best = max(s.items(), key=lambda kv: (round(kv[1], 6), -kv[0]))
    assert out[1]["sent_idx"] == best_idx
    assert out[1]["score"] == pytest.approx(round(best, 6), abs=2e-6)


def test_theilsen_matches_pure_python_median_slopes(spark, sf_dir):
    """Replay Theil-Sen (median pairwise slope, median residual
    intercept, linear-interpolated medians) in pure Python from the
    same weekly series, and pin robustness: a synthetic outlier week
    moves the OLS slope but not the Theil-Sen slope."""
    import statistics

    from gcp_cloudsql_airflow_bigquery_spark.plans import advanced

    out = {r["n_name"]: r for r in advanced.nation_revenue_theilsen(spark, sf_dir).collect()}
    # rebuild the weekly frame via the already-oracle-checked OLS twin's
    # inputs: collect (nation, week-start, revenue) in python
    li = load_table(spark, sf_dir, "lineitem").collect()
    orders = {r["o_orderkey"]: r["o_custkey"] for r in load_table(spark, sf_dir, "orders").collect()}
    cust = {r["c_custkey"]: r["c_nationkey"] for r in load_table(spark, sf_dir, "customer").collect()}
    nat = {r["n_nationkey"]: r["n_name"] for r in load_table(spark, sf_dir, "nation").collect()}
    wk: defaultdict = defaultdict(float)
    for r in li:
        d = r["l_shipdate"]
        monday = d.toordinal() - d.weekday()
        key = (nat[cust[orders[r["l_orderkey"]]]], monday)
        wk[key] = round(wk[key] + round(r["l_extendedprice"], 6), 6)
    w0 = min(m for _, m in wk)
    pts: defaultdict = defaultdict(list)
    for (nname, m), rev in wk.items():
        pts[nname].append(((m - w0) // 7, rev))

    def median(vals):
        vals = sorted(vals)
        n = len(vals)
        if n % 2:
            return vals[n // 2]
        return (vals[n // 2 - 1] + vals[n // 2]) / 2

    for nname, series in pts.items():
        slopes = [
            (rb - ra) / (xb - xa)
            for (xa, ra) in series
            for (xb, rb) in series
            if xa < xb
        ]
        sm = median(slopes)
        im = median([rev - sm * x for x, rev in series])
        r = out[nname]
        assert r["n_weeks"] == len(series)
        assert r["n_pairs"] == len(slopes)
        assert r["ts_slope"] == pytest.approx(round(sm, 4), abs=2e-3)
        assert r["ts_intercept"] == pytest.approx(round(im, 4), abs=2e-3)

    # robustness pin on synthetic data: one blowout week
    xs = list(range(10))
    ys = [100.0 + 10 * x for x in xs]
    ys[5] = 10_000.0
    slopes = [
        (ys[j] - ys[i]) / (j - i) for i in range(10) for j in range(i + 1, 10)
    ]
    assert median(slopes) == pytest.approx(10.0, abs=1.0)  # robust
    ols = statistics.linear_regression(xs, ys).slope
    assert abs(ols - 10.0) > 50  # OLS dragged by the outlier
