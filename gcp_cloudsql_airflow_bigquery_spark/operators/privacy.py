r"""PII detection and redaction over a text column.

A pretraining corpus has to be scrubbed of emails, URLs, phone numbers
and bare IPs before the data ships; the reference pipeline has no such
stage (it moves trusted warehouse rows), so this is part of the
north-star LLM-data surface (BASELINE.json), not reference parity.

Everything is built-in ``regexp_*`` — JVM-side, whole-stage codegen,
zero shuffles: a pure narrow map over the corpus, so at 100 TB it runs
at parquet scan speed and composes with any downstream filter without
adding a stage boundary.

The patterns avoid lookaround and backreferences on purpose so they
mean the same thing in Java regex (Spark) and RE2 (DuckDB / Go / Rust
scrubbers) — the oracle check depends on that, and so does anyone
re-validating the scrub with a non-JVM tool.

Redaction is *sequential* (emails → URLs → IPs → phones), each stage
matching against the previous stage's output: URLs and emails contain
digit runs that the looser phone pattern would otherwise re-match, and
IPv4s are a strict subset of the phone pattern's language. Counts are
taken on the same intermediate strings, so ``n_phones`` never
double-counts an IP.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
URL_RE = r"https?://[^\s]+"
IPV4_RE = r"\b[0-9]{1,3}(\.[0-9]{1,3}){3}\b"
PHONE_RE = r"\+?[0-9][0-9()\-. ]{6,}[0-9]"

# (name, pattern, replacement token) in the order redaction must run
PII_STAGES: tuple[tuple[str, str, str], ...] = (
    ("email", EMAIL_RE, "<EMAIL>"),
    ("url", URL_RE, "<URL>"),
    ("ip", IPV4_RE, "<IP>"),
    ("phone", PHONE_RE, "<PHONE>"),
)


def _count(text: Column, pattern: str) -> Column:
    return F.size(F.regexp_extract_all(text, F.lit(pattern), 0))


def redact_pii(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Append per-type match counts (``n_email`` …) and a fully
    scrubbed ``redacted`` column.  Stage *k*'s count is measured on the
    text after stages 1..k-1 replaced their matches, mirroring the
    sequential rewrite, so the counts always sum to the number of
    replacement tokens in ``redacted``."""
    out = df
    cur: Column = F.col(text_col)
    for name, pattern, token in PII_STAGES:
        out = out.withColumn(f"n_{name}", _count(cur, pattern))
        cur = F.regexp_replace(cur, pattern, token)
    return out.withColumn("redacted", cur)


def k_anonymity_report(
    df: DataFrame,
    quasi: Sequence[str | Column],
    sensitive: str | Column,
    thresholds: Sequence[int] = (2, 5, 10, 25),
) -> DataFrame:
    """Re-identification risk report: for each k threshold, how many
    quasi-identifier equivalence classes (and rows) fall below k
    members, and the worst l-diversity (distinct sensitive values)
    among those at-risk classes.  The release-gate question a training
    corpus with user-derived rows has to answer before it ships.

    Scale shape: ONE hash aggregation over the quasi-identifier tuple
    builds the class frame (partial aggregation map-side, a single
    shuffle on the QI key); the per-threshold rollup is a second
    aggregate over the class frame that computes every threshold's
    conditional sums in one pass into an array of structs and explodes
    the single result row — no per-threshold rescan, no join against a
    thresholds literal (which would plan as a nested-loop join).  The
    class frame is at worst corpus-sized but typically crushes by the
    QI cardinality, and nothing downstream of it touches raw rows."""
    classes = df.groupBy(*quasi).agg(
        F.count(F.lit(1)).alias("cnt"),
        F.countDistinct(sensitive).alias("l_div"),
    )
    per_k = [
        F.struct(
            F.lit(int(k)).alias("k_threshold"),
            F.sum(F.when(F.col("cnt") < k, 1).otherwise(0))
            .cast("long")
            .alias("classes_at_risk"),
            F.coalesce(F.sum(F.when(F.col("cnt") < k, F.col("cnt"))), F.lit(0))
            .cast("long")
            .alias("rows_at_risk"),
            F.min(F.when(F.col("cnt") < k, F.col("l_div"))).alias(
                "worst_l_diversity"
            ),
        )
        for k in thresholds
    ]
    agg = classes.agg(
        F.count(F.lit(1)).alias("n_classes"),
        F.sum("cnt").cast("long").alias("n_rows"),
        F.min("cnt").cast("long").alias("min_class_size"),
        F.array(*per_k).alias("per_k"),
    )
    return agg.select(
        F.explode("per_k").alias("t"), "n_classes", "n_rows", "min_class_size"
    ).select(
        F.col("t.k_threshold").alias("k_threshold"),
        F.col("t.classes_at_risk").alias("classes_at_risk"),
        F.col("t.rows_at_risk").alias("rows_at_risk"),
        F.round(F.col("t.rows_at_risk") / F.col("n_rows"), 6).alias(
            "pct_rows_at_risk"
        ),
        F.col("t.worst_l_diversity").alias("worst_l_diversity"),
        "n_classes",
        "n_rows",
        "min_class_size",
    )


def t_closeness_report(
    df: DataFrame,
    quasi: Sequence[str],
    band_col: str,
    top_n: int = 20,
) -> DataFrame:
    """t-closeness for an ORDERED sensitive attribute (the band
    column): per quasi-identifier equivalence class, the 1-D earth
    mover's distance between the class's band distribution and the
    global one, ``EMD = (1/(m-1)) * sum_i |sum_{j<=i}(p_j - q_j)|`` —
    the distributional refinement of k-anonymity/l-diversity (a class
    can be large AND diverse yet still leak "everyone here is rich").
    Emits the ``top_n`` worst classes by (rounded EMD, keys).

    Scale shape: one (QI, band) aggregation + one QI aggregation + one
    band aggregation; the dense class x band grid is a broadcast
    nested-loop of the CLASS frame against the (bounded) band list —
    QI-cardinality-sized, never row-sized; the cumulative sum runs per
    class over the band-bounded frame.  Cross-engine exactness: the
    per-band diffs are DECIMAL-cast before the windowed cumsum —
    DuckDB's segment-tree window aggregation sums doubles in a
    different order than Spark's sequential running sum, and decimal
    addition is order-independent."""
    from pyspark.sql import Window

    bands = df.groupBy(band_col).agg(F.count(F.lit(1)).alias("g_cnt"))
    nm = bands.agg(
        F.sum("g_cnt").cast("long").alias("n_tot"),
        F.count(F.lit(1)).alias("m"),
    )
    classes = df.groupBy(*quasi).agg(F.count(F.lit(1)).alias("class_n"))
    cnts = df.groupBy(*list(quasi), band_col).agg(
        F.count(F.lit(1)).alias("k")
    )
    grid = classes.crossJoin(F.broadcast(bands))
    full = (
        grid.join(cnts, [*quasi, band_col], "left")
        .withColumn("k", F.coalesce(F.col("k"), F.lit(0)))
        .crossJoin(F.broadcast(nm))
        .withColumn(
            "diff_dec",
            (
                F.col("k") / F.col("class_n")
                - F.col("g_cnt") / F.col("n_tot")
            ).cast("decimal(28,18)"),
        )
    )
    w = (
        Window.partitionBy(*quasi)
        .orderBy(band_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = full.withColumn("cum", F.sum("diff_dec").over(w))
    emd = cum.groupBy(*list(quasi), "class_n", "m").agg(
        F.sum(F.abs(F.col("cum"))).alias("s")
    )
    return (
        emd.select(
            *quasi,
            "class_n",
            F.round(
                F.col("s").cast("double") / (F.col("m") - 1), 6
            ).alias("t_emd"),
        )
        .orderBy(F.col("t_emd").desc(), *[F.col(q).asc() for q in quasi])
        .limit(top_n)
    )


def l_diversity_report(
    df: DataFrame,
    quasi: Sequence[str],
    sensitive: str,
    top_n: int = 25,
) -> DataFrame:
    """Entropy l-diversity per quasi-identifier equivalence class —
    the gate between :func:`k_anonymity_report` (which only counts
    class SIZE plus the worst distinct-l) and
    :func:`t_closeness_report` (which needs an ordered sensitive
    attribute): a class is safe when the sensitive attribute is not
    just present in >1 value but well-SPREAD, measured by the Shannon
    entropy of its within-class distribution.  Emits the ``top_n``
    worst classes by (distinct_l ASC, entropy ASC, keys) — the rows a
    release review reads first.

    Cross-engine determinism: the entropy sum runs over at most
    |sensitive domain| doubles per class and is rounded to 6 decimals
    BEFORE it participates in the ordering, so tie-breaks cannot flip
    between engines.

    Scale shape: one (QI, sensitive) hash aggregation, one
    QI-partitioned window for the class totals (partitioned — never a
    global window), one QI aggregation; the top-n is a TakeOrdered
    over the class frame (QI-cardinality-sized, not row-sized)."""
    from pyspark.sql import Window

    qcols = list(quasi)
    cnts = df.groupBy(*qcols, sensitive).agg(F.count(F.lit(1)).alias("k"))
    w = Window.partitionBy(*qcols)
    p = F.col("k") / F.sum("k").over(w)
    per_class = (
        cnts.withColumn("_h", -p * F.log(p))
        .groupBy(*qcols)
        .agg(
            F.sum("k").cast("long").alias("class_n"),
            F.count(F.lit(1)).cast("long").alias("distinct_l"),
            F.round(F.sum("_h"), 6).alias("entropy_l"),
        )
    )
    return per_class.orderBy(
        F.col("distinct_l").asc(),
        F.col("entropy_l").asc(),
        *[F.col(q).asc() for q in qcols],
    ).limit(top_n)
