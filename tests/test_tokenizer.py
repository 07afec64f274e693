"""BPE trainer: differential test vs a pure-Python reference
implementation (Sennrich-style, word-frequency formulation), plus
encode round-trip properties."""

from __future__ import annotations

from collections import Counter

from pyspark.sql import functions as F

from gcp_cloudsql_airflow_bigquery_spark.operators.tokenizer import (
    END_MARK,
    bpe_encode,
    bpe_train,
    merge_pair_in,
    word_freq_table,
)


# --- pure-Python reference ---------------------------------------------------

def _py_word_freqs(texts):
    c = Counter()
    for t in texts:
        for w in " ".join(t.lower().split()).split(" "):
            if w:
                c[w] += 1
    return c


def _py_merge(sym, a, b):
    out, i = [], 0
    while i < len(sym):
        if i + 1 < len(sym) and sym[i] == a and sym[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(sym[i])
            i += 1
    return out


def _py_bpe_train(texts, n_merges, min_pair_count=2):
    wf = {
        tuple(list(w) + [END_MARK]): n for w, n in _py_word_freqs(texts).items()
    }
    merges = []
    for _ in range(n_merges):
        pairs = Counter()
        for sym, n in wf.items():
            for x, y in zip(sym, sym[1:]):
                pairs[(x, y)] += n
        if not pairs:
            break
        # deterministic: count desc, then pair lexicographic
        (a, b), cnt = sorted(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if cnt < min_pair_count:
            break
        merges.append((a, b, cnt))
        wf = {tuple(_py_merge(list(s), a, b)): n for s, n in wf.items()}
    return merges


def _py_encode(text, merges):
    toks = []
    for w in " ".join(text.lower().split()).split(" "):
        if not w:
            continue
        sym = list(w) + [END_MARK]
        for a, b, _ in merges:
            sym = _py_merge(sym, a, b)
        toks.extend(sym)
    return toks


_TEXTS = [
    "low lower lowest low low",
    "new newer newest new newer",
    "wide wider widest wide",
    "low newer low wide lowest",
]


def _docs(spark):
    return spark.createDataFrame(
        list(enumerate(_TEXTS)), ["doc_id", "text"]
    )


def test_bpe_train_matches_python_reference(spark):
    got = bpe_train(_docs(spark), n_merges=12)
    want = _py_bpe_train(_TEXTS, n_merges=12)
    assert got == want
    assert len(got) >= 8  # the fixture supports a real merge sequence


def test_bpe_encode_matches_python_reference(spark):
    merges = bpe_train(_docs(spark), n_merges=10)
    enc = {
        r.doc_id: list(r.tokens)
        for r in bpe_encode(_docs(spark), merges).collect()
    }
    for i, t in enumerate(_TEXTS):
        assert enc[i] == _py_encode(t, merges), f"doc {i}"


def test_bpe_encode_compresses(spark):
    """Merges strictly shorten the token stream vs raw characters."""
    docs = _docs(spark)
    merges = bpe_train(docs, n_merges=10)
    enc = bpe_encode(docs, merges)
    n_tok = enc.select(F.sum(F.size("tokens"))).first()[0]
    n_char_plus_words = docs.select(
        F.sum(
            F.length(F.regexp_replace(F.lower("text"), r"\s+", ""))
            + F.size(F.split(F.trim("text"), r"\s+"))
        )
    ).first()[0]
    assert n_tok < n_char_plus_words


def test_merge_pair_handles_overlaps_left_to_right(spark):
    df = spark.createDataFrame([(["a", "a", "a", "a", "a"],)], ["sym"])
    out = df.select(merge_pair_in(F.col("sym"), "a", "a").alias("m")).first().m
    assert list(out) == ["aa", "aa", "a"]


_ADVERSARIAL_TEXTS = [
    # doubled-pair words: merging (g,a) in 'gaga' makes two occurrences
    # that share a boundary; repeated-symbol runs ('aaaaa') make
    # overlapping occurrences — both break a naive single-delimiter
    # string-replace oracle replay (ADVICE r5).
    "gaga gaga gagaga gag",
    "aaaaa aaaa aaa aa",
    "banana bananas banana",
    "low lower lowest low low",
]


def test_bpe_duckdb_oracle_matches_fold_on_adversarial_corpus(spark):
    """The unrolled DuckDB replay (doubled-delimiter replace) must equal
    both the Spark trainer and the pure-Python (out, skip) fold on a
    corpus full of boundary-sharing and overlapping pair occurrences."""
    import duckdb
    import pandas as pd

    from gcp_cloudsql_airflow_bigquery_spark.plans.llmdata import (
        _bpe_tokens_oracle,
        _bpe_vocab_oracle,
    )

    docs_pdf = pd.DataFrame(
        {
            "doc_id": range(len(_ADVERSARIAL_TEXTS)),
            "text": _ADVERSARIAL_TEXTS,
            "n_chars": [len(t) for t in _ADVERSARIAL_TEXTS],
        }
    )
    con = duckdb.connect()
    con.register("documents", docs_pdf)

    n_merges = 12
    want = _py_bpe_train(_ADVERSARIAL_TEXTS, n_merges=n_merges)
    got_oracle = con.execute(_bpe_vocab_oracle(n_merges)).fetchall()
    got_oracle = sorted(got_oracle)  # merge_rank leads, so sorts by round
    assert [
        (a, b, c) for _, a, b, _, c in got_oracle
    ] == want, "DuckDB vocab replay diverges from the (out, skip) fold"

    sdocs = spark.createDataFrame(
        list(enumerate(_ADVERSARIAL_TEXTS)), ["doc_id", "text"]
    )
    assert bpe_train(sdocs, n_merges=n_merges) == want

    # token counts per doc: oracle vs pure-Python encode
    tok_oracle = {
        r[0]: r[1]
        for r in con.execute(_bpe_tokens_oracle(n_merges)).fetchall()
    }
    merges = want
    for i, t in enumerate(_ADVERSARIAL_TEXTS):
        assert tok_oracle[i] == len(_py_encode(t, merges)), f"doc {i}"


def test_word_freq_table_is_the_only_corpus_pass(spark):
    wf = {r.word: r.n for r in word_freq_table(_docs(spark)).collect()}
    assert wf["low"] == 5 and wf["newer"] == 3
