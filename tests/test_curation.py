"""Oracle-differential + property tests for corpus-curation operators
(chunking, balanced sampling, split assignment)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from gcp_cloudsql_airflow_bigquery_spark.catalog import load_table
from gcp_cloudsql_airflow_bigquery_spark.operators import curation
from gcp_cloudsql_airflow_bigquery_spark.plans import curation as plans
from gcp_cloudsql_airflow_bigquery_spark.testing import compare_spark_duckdb


@pytest.mark.parametrize("name", sorted(plans.QUERIES))
def test_curation_matches_oracle(spark, duck, sf_dir, name):
    df = plans.QUERIES[name](spark, sf_dir)
    mismatch = compare_spark_duckdb(df, duck, plans.ORACLE[name])
    assert mismatch is None, f"{name}: {mismatch}"


def test_registry_keys_align():
    assert set(plans.QUERIES) == set(plans.ORACLE)


def test_chunks_cover_full_text(spark, sf_dir):
    # concatenating stride-aligned chunk prefixes reconstructs the text
    docs = load_table(spark, sf_dir, "documents")
    chunks = curation.chunk_text(docs, size=100, stride=100)  # no overlap
    rebuilt = (
        chunks.groupBy("doc_id")
        .agg(
            F.concat_ws(
                "", F.array_sort(F.collect_list(F.struct("chunk_idx", "chunk")))
                .getField("chunk")
            ).alias("rebuilt")
        )
        .join(docs.select("doc_id", "text"), "doc_id")
        .filter(F.col("rebuilt") != F.col("text"))
    )
    assert rebuilt.count() == 0


def test_chunk_bounds(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    chunks = curation.chunk_text(docs, size=120, stride=100)
    assert chunks.filter(F.col("chunk_len") > 120).count() == 0
    assert chunks.filter(F.col("chunk_len") <= 0).count() == 0


def test_balanced_sample_quota_and_determinism(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    s1 = curation.balanced_sample(docs, per_group=7)
    counts = s1.groupBy("source").count().collect()
    assert counts and all(r["count"] <= 7 for r in counts)
    s2 = curation.balanced_sample(docs.orderBy(F.rand(seed=1)), per_group=7)
    assert {r.doc_id for r in s1.collect()} == {r.doc_id for r in s2.collect()}


def test_split_assignment_stable_and_total(spark, sf_dir):
    docs = load_table(spark, sf_dir, "documents")
    out = curation.assign_splits(docs)
    assert out.count() == docs.count()
    # subsetting the corpus never moves a doc between splits
    sub = curation.assign_splits(docs.filter(F.col("doc_id") % 3 == 0))
    joined = out.select("doc_id", "split").join(
        sub.select("doc_id", F.col("split").alias("split2")), "doc_id"
    )
    assert joined.filter(F.col("split") != F.col("split2")).count() == 0
