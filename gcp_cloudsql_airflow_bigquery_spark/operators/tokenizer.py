"""Distributed BPE tokenizer training + encoding.

The classic corpus-scale trick (Sennrich et al. 2016): BPE statistics
only depend on the WORD FREQUENCY TABLE, not the corpus — so the one
corpus-sized pass is a word count (map-side combined), and every merge
round after that runs over the distinct-word table (vocabulary-sized:
millions of rows at 100 TB, not billions).  Each round is

    1. explode adjacent symbol pairs per distinct word, weighted by
       word count → one aggregation → global top pair (count desc,
       pair asc — deterministic across engines and cluster sizes);
    2. merge that pair inside every word's symbol array — a narrow
       per-row HOF fold, no shuffle — and cut lineage with a LAZY
       ``localCheckpoint`` so the next round's aggregation both
       materializes the merge and reads the stats: one Spark job per
       merge round.

The trained model is the ordered merge list (kilobytes).  Encoding
applies the merges in order as the same fold — pure Catalyst
expressions, no Python in the row path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .textstats import normalize_text, tokens

END_MARK = "▁"  # end-of-word sentinel (SentencePiece-style block)

# Lineage-cut cadence of bpe_encode's stacked merge folds (one lazy
# localCheckpoint every N merge levels).  Catalyst tree transforms
# lose node sharing, so an unbroken chain of nested ``aggregate``
# expressions grows exponentially (measured r9: OOM at plan build past
# ~8 levels).  r11 measured 2/4/8 interleaved min-of-3 at sf0.1
# (OPTIMIZATION_r11.md wave 3): 8 wins (~−20% on both BPE queries —
# half the lazy-cut analyses, still at the documented safe depth; the
# merge count is model-pinned at 24, so the nesting depth is fixed
# regardless of SF).
_ENCODE_CUT_EVERY = 8

# Per-merge-round lineage-cut mode of bpe_train's word-frequency frame.
# Lazy folds the checkpoint materialization into the NEXT round's
# top-pair job (one Spark job per merge round); eager would add a
# second job per round.  r11 measured both — see OPTIMIZATION_r11.md.
_TRAIN_CUT_EAGER = False


def _chars(word: Column) -> Column:
    """Word → array of single-character symbols + end-of-word mark."""
    return F.concat(
        F.transform(
            F.sequence(F.lit(1), F.length(word)),
            lambda i: word.substr(i, F.lit(1)),
        ),
        F.array(F.lit(END_MARK)),
    )


def merge_pair_in(arr: Column, a: str, b: str) -> Column:
    """Replace every left-to-right non-overlapping adjacent (a, b) in
    ``arr`` with the merged symbol ``a+b``.  A single ``aggregate`` fold
    with a (out, skip) accumulator — narrow, whole-stage-codegen."""
    merged = a + b
    init = F.struct(
        F.array().cast("array<string>").alias("out"), F.lit(False).alias("skip")
    )

    def step(acc: Column, i: Column) -> Column:
        cur = F.element_at(arr, i)
        nxt = F.try_element_at(arr, i + 1)  # NULL past the end (ANSI-safe)
        is_pair = (cur == F.lit(a)) & F.coalesce(nxt == F.lit(b), F.lit(False))
        return (
            F.when(
                acc["skip"],
                F.struct(acc["out"].alias("out"), F.lit(False).alias("skip")),
            )
            .when(
                is_pair,
                F.struct(
                    F.concat(acc["out"], F.array(F.lit(merged))).alias("out"),
                    F.lit(True).alias("skip"),
                ),
            )
            .otherwise(
                F.struct(
                    F.concat(acc["out"], F.array(cur)).alias("out"),
                    F.lit(False).alias("skip"),
                )
            )
        )

    return F.aggregate(
        F.sequence(F.lit(1), F.size(arr)), init, step, lambda acc: acc["out"]
    )


def word_freq_table(
    docs: DataFrame, text_col: str = "text"
) -> DataFrame:
    """(word, n): the corpus word-frequency table — the ONLY
    corpus-sized pass in BPE training."""
    return (
        docs.select(
            F.explode(tokens(normalize_text(F.col(text_col)))).alias("word")
        )
        .groupBy("word")
        .agg(F.count("*").alias("n"))
    )


def bpe_train(
    docs: DataFrame,
    n_merges: int = 20,
    text_col: str = "text",
    min_pair_count: int = 2,
) -> list[tuple[str, str, int]]:
    """Train ``n_merges`` BPE merges on the corpus; returns the ordered
    merge list [(left, right, weighted_count), ...] — the tokenizer
    model.  Stops early when the best pair drops under
    ``min_pair_count`` occurrences."""
    wf = (
        word_freq_table(docs, text_col)
        .select(F.col("n"), _chars(F.col("word")).alias("sym"))
        .localCheckpoint(eager=True)
    )
    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        pairs = (
            wf.select(
                "n",
                F.explode(
                    F.zip_with(
                        F.slice(F.col("sym"), 1, F.size("sym") - 1),
                        F.slice(F.col("sym"), 2, F.size("sym") - 1),
                        lambda x, y: F.struct(x.alias("a"), y.alias("b")),
                    )
                ).alias("p"),
            )
            .groupBy("p")
            .agg(F.sum("n").alias("cnt"))
            .orderBy(F.col("cnt").desc(), F.col("p.a"), F.col("p.b"))
        )
        top = pairs.first()
        if top is None or top.cnt < min_pair_count:
            break
        a, b = top.p.a, top.p.b
        merges.append((a, b, int(top.cnt)))
        # lazy checkpoint: the NEXT round's aggregation materializes the
        # merge and reads its stats in the same job
        wf = wf.select("n", merge_pair_in(F.col("sym"), a, b).alias("sym"))
        wf = wf.localCheckpoint(eager=_TRAIN_CUT_EAGER)
    return merges


def bpe_encode(
    docs: DataFrame,
    merges: list[tuple[str, str, int]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, tokens): encode each document with the trained merge list.

    Merges are applied over the DISTINCT-WORD table (vocabulary-sized)
    — each fold runs once per word type, not once per occurrence — and
    the resulting word→tokens map joins back onto the exploded corpus.
    Stacked merge folds are lineage-cut every few levels: Catalyst
    tree transforms lose node sharing, so an unbroken chain of nested
    ``aggregate`` expressions grows exponentially (measured: OOM at
    plan build past ~8 levels)."""
    exploded = docs.select(
        id_col,
        F.posexplode(tokens(normalize_text(F.col(text_col)))).alias("pos", "w"),
    )
    wmap = exploded.select(F.col("w").alias("word")).distinct().select(
        "word", _chars(F.col("word")).alias("toks")
    )
    for i, (a, b, _) in enumerate(merges):
        wmap = wmap.select(
            "word", merge_pair_in(F.col("toks"), a, b).alias("toks")
        )
        if (i + 1) % _ENCODE_CUT_EVERY == 0:
            wmap = wmap.localCheckpoint(eager=False)
    # word order inside the doc is restored by sorting the collected
    # (pos, toks) structs — collect_list alone has no order contract.
    # No broadcast hint on wmap (r10 de-hinting policy): the distinct-
    # word vocabulary is OPEN — it grows with the corpus (Heaps' law) —
    # so forcing it as the build side bypasses the threshold at any
    # size, the same leak class as the k_core alive set; the repo's
    # other open-vocab joins (bigram LM, tf-idf vocab) are already
    # threshold-driven.  Catalyst/AQE pick the strategy: at bench SF
    # the static planner still picks a broadcast join (building the
    # smaller-estimated side — see plans/r10/doc_bpe_tokens_devocab_
    # after.txt, a BroadcastHashJoin with the build side swapped); at
    # scale both estimates exceed the threshold, the join sort-merges,
    # and AQE can flip it back if runtime sizes say the vocab fits.
    return (
        exploded.join(wmap, exploded.w == wmap.word)
        .select(id_col, "pos", "toks")
        .groupBy(id_col)
        .agg(
            F.flatten(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "toks"))),
                    lambda s: s["toks"],
                )
            ).alias("tokens")
        )
    )
