r"""Deduplication operators (SURVEY.md §2b "dedup" + north star):
exact, n-gram Jaccard, MinHash+LSH, SimHash.

Scale design:
- Exact dedup is a hash-groupBy — one shuffle on the 128-bit digest,
  perfectly balanced regardless of document skew.
- N-gram Jaccard is exact pairwise similarity via an inverted index
  (explode shingles → self-join on shingle → count per pair).  Quadratic
  in the worst case; at 100 TB use it only on LSH candidate pairs.
- MinHash+LSH is the scale path: k deterministic hash slots → b bands ×
  r rows → band-bucket join.  Shuffles are on band signatures (uniform);
  candidate verification re-runs exact Jaccard on the candidates only.
- SimHash gives 64-bit signatures; near-dup = small Hamming distance,
  banded into 4×16-bit keys for blocking.

All hashing is ``xxhash64``/``md5`` built-ins — JVM-side, deterministic
across runs and cluster sizes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .textstats import normalize_text, tokens


def word_shingles(text: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles of normalized text."""
    toks = tokens(normalize_text(text))
    size = F.size(toks)
    idx = F.when(size >= n, F.sequence(F.lit(1), size - n + 1)).otherwise(
        F.array().cast("array<int>")
    )
    return F.array_distinct(
        F.transform(idx, lambda i: F.concat_ws(" ", F.slice(toks, i, n)))
    )


def exact_dedup_groups(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Hash-groupBy exact dedup: one row per distinct content with the
    canonical (min) id and the duplicate count."""
    return (
        df.select(
            F.md5(normalize_text(F.col(text_col))).alias("content_hash"),
            F.col(id_col),
        )
        .groupBy("content_hash")
        .agg(
            F.min(id_col).alias("canonical_id"),
            F.count("*").alias("n_copies"),
        )
    )


def exact_dedup(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Keep exactly one (min-id) row per distinct normalized content."""
    h = F.md5(normalize_text(F.col(text_col)))
    w_min = exact_dedup_groups(df, text_col, id_col).select(
        "content_hash", F.col("canonical_id").alias(id_col)
    )
    return df.withColumn("content_hash", h).join(
        w_min, ["content_hash", id_col], "left_semi"
    ).drop("content_hash")


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Exact pairwise n-gram Jaccard via inverted index.

    explode(shingles) → self-join on shingle (skew-safe: shingle keys are
    near-uniform after normalization) → |A∩B| per pair → Jaccard with
    precomputed |A|,|B|.
    """
    sh = df.select(
        F.col(id_col).alias("id"), word_shingles(F.col(text_col), n).alias("sh")
    ).filter(F.size("sh") > 0)
    sizes = sh.select("id", F.size("sh").alias("n_sh"))
    inv = sh.select("id", F.explode("sh").alias("shingle"))
    pairs = (
        inv.alias("a")
        .join(inv.alias("b"), "shingle")
        .filter(F.col("a.id") < F.col("b.id"))
        .groupBy(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .agg(F.count("*").alias("inter"))
    )
    return (
        pairs.join(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("n_sh", "n_a"), "id_a")
        .join(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("n_sh", "n_b"), "id_b")
        .withColumn(
            "jaccard",
            F.round(F.col("inter") / (F.col("n_a") + F.col("n_b") - F.col("inter")), 6),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 32,
    shingle_n: int = 3,
) -> DataFrame:
    """Deterministic MinHash: slot i = min over shingles of
    xxhash64(shingle, seed=i).  All array ops, no UDFs."""
    sh = df.select(
        F.col(id_col).alias("id"),
        word_shingles(F.col(text_col), shingle_n).alias("sh"),
    ).filter(F.size("sh") > 0)
    def seeded_hash(i: int):
        # 1-ary lambda factory (2-ary would receive the array index)
        return lambda s: F.xxhash64(s, F.lit(i))

    sig = F.array(
        *[F.array_min(F.transform("sh", seeded_hash(i))) for i in range(num_hashes)]
    )
    return sh.select("id", sig.alias("signature"))


def minhash_lsh_candidates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 32,
    bands: int = 8,
    shingle_n: int = 3,
) -> DataFrame:
    """LSH banding: split the signature into ``bands`` bands of
    ``num_hashes//bands`` rows; docs sharing any band bucket become a
    candidate pair.  The shuffle key is (band_idx, band_hash) — uniform
    by construction."""
    rows_per_band = num_hashes // bands
    sigs = minhash_signatures(df, text_col, id_col, num_hashes, shingle_n)
    banded = sigs.select(
        "id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.xxhash64(
                            F.concat_ws(
                                ",",
                                *[
                                    F.element_at("signature", b * rows_per_band + r + 1)
                                    for r in range(rows_per_band)
                                ],
                            )
                        ).alias("bucket"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select("id", "bb.band", "bb.bucket")
    return (
        banded.alias("a")
        .join(banded.alias("b"), ["band", "bucket"])
        .filter(F.col("a.id") < F.col("b.id"))
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )


def minhash_near_dups(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.7,
    num_hashes: int = 32,
    bands: int = 8,
    shingle_n: int = 3,
) -> DataFrame:
    """The full scale pipeline: LSH candidates → exact Jaccard verify.
    Only candidate pairs (tiny vs n²) pay the verification join."""
    cand = minhash_lsh_candidates(df, text_col, id_col, num_hashes, bands, shingle_n)
    sh = df.select(
        F.col(id_col).alias("id"), word_shingles(F.col(text_col), shingle_n).alias("sh")
    )
    a = sh.select(F.col("id").alias("id_a"), F.col("sh").alias("sh_a"))
    b = sh.select(F.col("id").alias("id_b"), F.col("sh").alias("sh_b"))
    return (
        cand.join(a, "id_a")
        .join(b, "id_b")
        .withColumn(
            "jaccard",
            F.round(
                F.size(F.array_intersect("sh_a", "sh_b"))
                / F.size(F.array_union("sh_a", "sh_b")),
                6,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def simhash(text: Column, num_bits: int = 64) -> Column:
    """64-bit SimHash from token xxhash64 values: per bit, sum ±1 over
    tokens and take the sign.  Expressed as array ops over the token
    hash list — no UDF, fully vectorizable."""
    toks = tokens(normalize_text(text))
    hashes = F.transform(toks, lambda t: F.xxhash64(t))
    def bit_votes(b: int):
        # 2-ary merge lambda factory (extra default args break HOF binding)
        return lambda acc, h: acc + F.when(
            F.shiftright(h, b).bitwiseAND(F.lit(1)) == 1, 1
        ).otherwise(-1)

    bit_cols = []
    for b in range(num_bits):
        # +1 if bit b set else -1, summed over tokens
        votes = F.aggregate(hashes, F.lit(0), bit_votes(b))
        bit_cols.append(
            F.when(votes > 0, F.lit(1).cast("long") * (2**b if b < 63 else -(2**63)))
            .otherwise(F.lit(0).cast("long"))
        )
    out = bit_cols[0]
    for c in bit_cols[1:]:
        out = out + c
    return out


def hamming64(a: Column, b: Column) -> Column:
    return F.bit_count(a.bitwiseXOR(b))


def simhash_near_dups(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_distance: int = 3,
) -> DataFrame:
    """SimHash blocking: 4×16-bit bands (any pair within Hamming ≤ 3 of
    a 64-bit key shares at least one exact 16-bit band), then verify the
    Hamming distance on candidates."""
    sigs = df.select(
        F.col(id_col).alias("id"), simhash(F.col(text_col)).alias("sig")
    )
    banded = sigs.select(
        "id",
        "sig",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftrightunsigned("sig", b * 16)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("key"),
                    )
                    for b in range(4)
                ]
            )
        ).alias("bk"),
    ).select("id", "sig", "bk.band", "bk.key")
    return (
        banded.alias("a")
        .join(banded.alias("b"), ["band", "key"])
        .filter(F.col("a.id") < F.col("b.id"))
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            hamming64(F.col("a.sig"), F.col("b.sig")).alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_distance)
    )
