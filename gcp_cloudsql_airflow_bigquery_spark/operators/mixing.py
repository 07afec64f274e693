r"""Corpus mixing: temperature-based source re-weighting with
deterministic up/down-sampling, and training-order sharding.

The reference moves whole tables unchanged (full-copy sync,
reference ``README.md:8``); composing a *training mix* — "N% code, M%
web, temperature-smoothed so small sources aren't drowned" — is the
step every large-scale pretraining pipeline runs after curation, so it
is part of the north-star LLM-data surface (BASELINE.json).

Design for 100 TB:

- All randomness is a **portable hash uniform**: the first 8 hex chars
  of ``md5(seed || key)`` scaled to [0, 1).  No RNG state, no seed
  plumbed through executors — membership of every row is a pure
  function of (seed, key), so a re-run, a resumed job, or a DuckDB
  audit of the same expression reproduces the mix bit-for-bit, and the
  sampling predicate pushes down to the parquet scan.
- ``mix_rates`` aggregates one tiny (source → count) table; the corpus
  itself is touched only by ``resample``, which broadcast-joins the
  per-source rate (a handful of rows) and then runs a **narrow**
  filter/explode — no corpus shuffle at any temperature.
- Upsampling repeats a row ``floor(rate)`` times plus one more with
  probability ``frac(rate)``, via ``explode(sequence(1, n_copies))`` —
  the expected copy count is exactly the requested rate, per-row, with
  no global pass.  The ``epoch`` index makes repeats distinguishable
  downstream (e.g. for epoch-aware packing).
- ``shard_order`` gives every row a stable (shard, position) for
  training-order shuffling: shard = hash bucket of the key, position =
  rank of a *different* hash within the shard.  One window shuffle,
  partitioned by shard — at 100 TB each shard sorts independently, and
  a grown corpus only appends to shards (earlier rows keep their hash,
  though ranks after an insertion point shift within the shard).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_HASH_DENOM = float(1 << 32)


def hash_uniform(key: Column, seed: str) -> Column:
    """Deterministic uniform in [0, 1): first 8 md5 hex chars of
    ``seed || key`` as a 32-bit integer, scaled.  Portable — DuckDB:
    ``cast(concat('0x', substr(md5(seed || key), 1, 8)) as ubigint)
    / 4294967296``."""
    hexpart = F.substring(F.md5(F.concat(F.lit(seed), key.cast("string"))), 1, 8)
    return F.conv(hexpart, 16, 10).cast("double") / F.lit(_HASH_DENOM)


def mix_rates(
    df: DataFrame,
    source_col: str = "source",
    temperature: float = 0.7,
) -> DataFrame:
    """Per-source sampling rates that turn the corpus's natural source
    distribution into the temperature-smoothed one: weights
    ``w_s ∝ n_s**T`` (T=1 natural, T→0 uniform), target size = corpus
    size, so ``rate_s = w_s * N / n_s`` — sources above their smoothed
    share get rate < 1 (downsample), sources below get rate > 1
    (upsample).  Output: ``(source, n_docs, weight, rate)``."""
    if temperature <= 0:
        raise ValueError("temperature must be positive")
    counts = df.groupBy(source_col).agg(F.count("*").alias("n_docs"))
    total = Window.partitionBy()
    smoothed = F.pow(F.col("n_docs").cast("double"), F.lit(float(temperature)))
    return (
        counts.withColumn("w_raw", smoothed)
        .withColumn("weight", F.col("w_raw") / F.sum("w_raw").over(total))
        .withColumn(
            "rate",
            F.col("weight") * F.sum("n_docs").over(total) / F.col("n_docs"),
        )
        .drop("w_raw")
    )


def resample(
    df: DataFrame,
    rates: DataFrame,
    source_col: str = "source",
    id_col: str = "doc_id",
    seed: str = "mix-v1",
) -> DataFrame:
    """Materialize the mix: each row is emitted ``floor(rate)`` times
    plus one more iff its hash uniform falls below ``frac(rate)``
    (expected copies = rate exactly; rate < 1 degenerates to plain
    deterministic downsampling).  Adds ``epoch`` (0-based copy index).
    The rates side is tiny and broadcast; the corpus pass is narrow."""
    u = hash_uniform(F.col(id_col), seed)
    n_copies = (
        F.floor("rate") + (u < F.col("rate") - F.floor("rate")).cast("long")
    ).alias("n_copies")
    joined = df.join(
        F.broadcast(rates.select(source_col, "rate")), source_col
    ).select("*", n_copies)
    return (
        joined.filter(F.col("n_copies") > 0)
        .withColumn(
            "epoch",
            F.explode(F.sequence(F.lit(0).cast("long"), F.col("n_copies") - 1)),
        )
        .drop("rate", "n_copies")
    )


def shard_order(
    df: DataFrame,
    n_shards: int,
    id_col: str = "doc_id",
    seed: str = "shuffle-v1",
) -> DataFrame:
    """Deterministic global training-order shuffle as (shard, position):
    ``shard`` is a hash bucket of the id (uniform across shards),
    ``position`` ranks an independent hash within the shard.  Readers
    stream shards in any order and rows within a shard by position; the
    interleaving is reproducible from (seed, n_shards) alone."""
    if n_shards <= 0:
        raise ValueError("n_shards must be positive")
    shard = (hash_uniform(F.col(id_col), seed + "-shard") * n_shards).cast("int")
    order_key = hash_uniform(F.col(id_col), seed + "-order")
    w = Window.partitionBy("shard").orderBy("order_u", id_col)
    return (
        df.withColumn("shard", shard)
        .withColumn("order_u", order_key)
        .withColumn("position", F.row_number().over(w) - 1)
        .drop("order_u")
    )
