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
