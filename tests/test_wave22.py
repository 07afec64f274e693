"""Round-10 wave differentials: Heaps'-law fit, RFM segmentation, and
the stream-#6 LWW upsert helpers are covered in their own modules;
here the pure-math properties are pinned against independent replays.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F


def test_heaps_law_matches_python_replay(spark, sf_dir):
    """doc_heaps_law equals a single-threaded pure-Python sweep of the
    same bucketing on the same fixture (exact integers; the OLS fit
    compared to 6 decimals like the oracle)."""
    from gcp_cloudsql_airflow_bigquery_spark.catalog import load_table
    from gcp_cloudsql_airflow_bigquery_spark.plans import llmdata

    got = llmdata.QUERIES["doc_heaps_law"](spark, sf_dir).first()

    docs = [
        (r.doc_id, r.text.strip().lower())
        for r in load_table(spark, sf_dir, "documents").collect()
        if r.text is not None and r.text.strip()
    ]
    mn = min(d for d, _ in docs)
    mx = max(d for d, _ in docs)
    per_tokens = [0] * 10
    first_seen: dict[str, int] = {}
    import re as _re

    for doc_id, text in docs:
        b = int(10.0 * (doc_id - mn) / (mx - mn + 1))
        toks = _re.split(r"\s+", text)
        per_tokens[b] += len(toks)
        for t in toks:
            if t not in first_seen or first_seen[t] > b:
                first_seen[t] = b
    new_v = [0] * 10
    for b in first_seen.values():
        new_v[b] += 1
    cum_t, cum_v, pts = 0, 0, []
    for b in range(10):
        cum_t += per_tokens[b]
        cum_v += new_v[b]
        pts.append((math.log(cum_t), math.log(cum_v)))
    n = len(pts)
    sx = sum(x for x, _ in pts)
    sy = sum(y for _, y in pts)
    sxx = sum(x * x for x, _ in pts)
    sxy = sum(x * y for x, y in pts)
    beta = (n * sxy - sx * sy) / (n * sxx - sx * sx)

    assert got.n_points == 10
    assert got.total_tokens == cum_t
    assert got.vocab_size == cum_v
    assert abs(got.heaps_beta - beta) < 1e-5
    # the synthetic fixture's vocabulary saturates almost immediately,
    # so beta sits near 0; real corpora land in (0.4, 0.9)
    assert 0.0 <= got.heaps_beta <= 1.0


def test_rfm_segments_bucket_properties(spark, sf_dir):
    """Every RFM score is a 1..5 quintile with bucket sizes differing
    by at most one (the NTILE contract), the cell code decomposes back
    into the three scores, and the best-spend customer scores m=1."""
    from gcp_cloudsql_airflow_bigquery_spark.catalog import load_table
    from gcp_cloudsql_airflow_bigquery_spark.plans import advanced

    rows = advanced.QUERIES["customer_rfm_segments"](spark, sf_dir).collect()
    n = len(rows)
    assert n > 0
    for col in ("r_score", "f_score", "m_score"):
        vals = [getattr(r, col) for r in rows]
        assert set(vals) <= {1, 2, 3, 4, 5}
        sizes = [vals.count(b) for b in sorted(set(vals))]
        assert max(sizes) - min(sizes) <= 1
    for r in rows:
        assert r.rfm_cell == r.r_score * 100 + r.f_score * 10 + r.m_score

    orders = load_table(spark, sf_dir, "orders")
    top = (
        orders.groupBy("o_custkey")
        .agg(F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("m"))
        .orderBy(F.col("m").desc(), F.col("o_custkey"))
        .first()
    )
    by_key = {r.custkey: r for r in rows}
    assert by_key[top.o_custkey].m_score == 1
