"""Grouped robust statistics via ``applyInPandas`` — the batch
grouped-map Pandas-UDF surface (SURVEY.md §2b "UDF/UDAF/UDTF" row).

Robust outlier scoring (|x − median| / MAD) needs two dependent
rank-statistics per group; as pure SQL that is two window/agg passes,
as a grouped-map kernel it is one numpy pass per group with Arrow
transfer. At 100 TB the shuffle is one hash partition by group key —
the same single-shuffle shape as any groupBy — and each group's pandas
frame is bounded by the largest entity (AQE-splittable upstream).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame


def mad_outliers(
    df: DataFrame,
    group_col: str,
    value_col: str,
    id_col: str,
    threshold: float = 2.0,
) -> DataFrame:
    """Rows whose value deviates from the group median by at least
    ``threshold`` MADs. Groups with MAD = 0 produce no outliers (the
    deviation scale is undefined)."""
    import numpy as np

    schema = (
        f"{group_col} long, {id_col} long, {value_col} double, mad_score double"
    )

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        x = pdf[value_col].to_numpy(dtype="float64")
        med = float(np.median(x))
        mad = float(np.median(np.abs(x - med)))
        if mad <= 0.0:
            return pdf.iloc[0:0][[group_col, id_col, value_col]].assign(
                mad_score=pd.Series(dtype="float64")
            )
        score = np.round(np.abs(x - med) / mad, 6)
        out = pdf[[group_col, id_col, value_col]].assign(mad_score=score)
        return out[out["mad_score"] >= threshold]

    return df.select(group_col, id_col, value_col).groupBy(group_col).applyInPandas(
        kernel, schema=schema
    )


def geomean_udaf():
    """Grouped-agg pandas UDF: geometric mean (Arrow-batched). Defined
    here so the ``pd.Series`` type hint resolves against this module's
    globals (pyspark evaluates stringified hints)."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def geomean(v: pd.Series) -> float:
        return float(np.exp(np.log(v.to_numpy(dtype="float64")).mean()))

    return geomean


def skyline_2d(
    df: DataFrame,
    cost_col: str,
    gain_col: str,
    num_partitions: int | None = None,
) -> DataFrame:
    """2-D skyline (Pareto frontier): rows not DOMINATED by any other —
    no other row has ``cost ≤`` AND ``gain ≥`` with one strict.  The
    multi-objective "best trade-offs" operator (cheapest-for-its-size
    parts, fastest-for-its-recall ANN configs, …).

    Scale-correct formulation — never a bare ``Window.orderBy`` over
    the SF-scaling input:

    1. one aggregation to the COST-GRAIN frame (max gain per distinct
       cost);
    2. a range-partitioned prefix-max over that frame: per-partition
       running max (``Window.partitionBy(_pid)``), plus each
       partition's max broadcast back as "all earlier partitions" via
       the strict-lower-pid self-join aggregate (the lazy
       ``global_rank`` offsets idiom — partition-count² pairs, i.e.
       nothing);
    3. a survivor test joined back to the data: keep a row iff its
       gain exceeds every STRICTLY-cheaper cost's best gain and ties
       the best gain AT its own cost (equal cost+gain rows are
       mutually non-dominating and all survive).

    Works for any orderable cost/gain; comparisons are exact on the
    input values (no floats introduced)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    best = df.groupBy(F.col(cost_col).alias("_cost")).agg(
        F.max(F.col(gain_col)).alias("_best")
    )
    ranged = (
        best.repartitionByRange(num_partitions, "_cost")
        if num_partitions
        else best.repartitionByRange("_cost")
    ).sortWithinPartitions("_cost")
    # EAGER: pmax, the prefix-max window, and the survivor join all
    # consume this frame concurrently — a lazy cut lets 32 tasks race
    # into recomputing unmaterialized partitions (the r10 ALS lesson)
    part = ranged.withColumn("_pid", F.spark_partition_id()).localCheckpoint(
        eager=True
    )
    pmax = part.groupBy("_pid").agg(F.max("_best").alias("_pmax"))
    lower = pmax.select(
        F.col("_pid").alias("_pid2"), F.col("_pmax").alias("_pmax2")
    )
    off = (
        pmax.join(lower, F.col("_pid2") < F.col("_pid"), "left")
        .groupBy("_pid")
        .agg(F.max("_pmax2").alias("_off"))
    )
    w = (
        Window.partitionBy("_pid")
        .orderBy("_cost")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    frontier = (
        part.join(F.broadcast(off), "_pid")
        .withColumn(
            "_prev",
            F.greatest(
                F.coalesce(F.max("_best").over(w), F.col("_off")),
                F.col("_off"),
            ),
        )
        .filter(F.col("_prev").isNull() | (F.col("_best") > F.col("_prev")))
        .select("_cost", "_best")
    )
    return df.join(
        frontier,
        (df[cost_col] == frontier["_cost"]) & (df[gain_col] == frontier["_best"]),
        "inner",
    ).drop("_cost", "_best")
