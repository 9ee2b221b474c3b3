"""Text-analysis function semantics (LLM-pipeline surface)."""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql import types as T

from merkonvectordb_spark.functions.text import (
    bpe_token_count,
    doc_fingerprint,
    lang_id,
    ngrams,
    quality_score,
    token_count,
    tokenize,
)


def _one(spark, text, col):
    return (
        spark.createDataFrame([(text,)], "text string")
        .select(col(F.col("text")).alias("v"))
        .first()
        .v
    )


def test_tokenize_and_counts(spark):
    assert _one(spark, "  Hello   World  ", tokenize) == ["hello", "world"]
    assert _one(spark, "a b  c", token_count) == 3
    assert _one(spark, "", token_count) == 0
    # BPE-ish: "don't stop!" → don ' t stop !
    assert _one(spark, "don't stop!", bpe_token_count) == 5


def test_ngrams_shingles(spark):
    got = (
        spark.createDataFrame([(["a", "b", "c", "d"],)], "toks array<string>")
        .select(ngrams(F.col("toks"), 3).alias("v"))
        .first()
        .v
    )
    assert got == ["a b c", "b c d"]
    short = (
        spark.createDataFrame([(["a"],)], "toks array<string>")
        .select(ngrams(F.col("toks"), 3).alias("v"))
        .first()
        .v
    )
    assert short == []


def test_lang_id_markers(spark):
    assert _one(spark, "the cat and the dog is in the house", lang_id) == "en"
    assert _one(spark, "der hund und die katze ist nicht da", lang_id) == "de"
    assert _one(spark, "xyzzy qwerty", lang_id) == "und"


def test_quality_score_bounds(spark):
    texts = ["", "short", "the " * 200, "a b c ! ! ! ? ?", "word " * 100]
    for t in texts:
        v = _one(spark, t, quality_score)
        assert 0.0 <= v <= 1.0, (t[:20], v)


def test_fingerprint_normalization(spark):
    a = _one(spark, "Hello   World", doc_fingerprint)
    b = _one(spark, "  hello world ", doc_fingerprint)
    c = _one(spark, "hello worlds", doc_fingerprint)
    assert a == b
    assert a != c
    assert len(a) == 32  # md5 hex


def test_pii_redact_and_counts(spark):
    from merkonvectordb_spark.functions.text import pii_counts, pii_redact

    df = spark.createDataFrame(
        [
            (1, "reach me at jane.doe+spam@mail.example.org today"),
            (2, "call +1 555-867-5309 or 212 555 1234"),
            (3, "no pii here at all"),
            (4, "two mails: a@b.co and c.d@e-f.org, one line 555-123-4567"),
        ],
        "id LONG, text STRING",
    )
    n_e, n_p = pii_counts(F.col("text"))
    rows = {
        r.id: (r.ne, r.np, r.red)
        for r in df.select(
            "id",
            n_e.alias("ne"),
            n_p.alias("np"),
            pii_redact(F.col("text")).alias("red"),
        ).collect()
    }
    assert rows[1] == (1, 0, "reach me at <EMAIL> today")
    # "+1 555-867-5309" → the 3-3-4 run matches; "212 555 1234" too
    assert rows[2][1] == 2 and "<PHONE>" in rows[2][2]
    assert rows[3] == (0, 0, "no pii here at all")
    assert rows[4][0] == 2 and rows[4][1] == 1
    assert "@" not in rows[4][2].replace("<EMAIL>", "")


def test_unigram_score_against_fixed_external_model(spark):
    """Scoring against a FIXED reference model: counts come from the
    model corpus, not the scored batch; unknown tokens drop out."""
    import math

    from merkonvectordb_spark.operators.lm import (
        unigram_logprob_score,
        unigram_model,
    )

    model_docs = spark.createDataFrame(
        [(1, "a a a b")], "doc_id LONG, text STRING"
    )
    freq, total = unigram_model(model_docs)  # P(a)=3/4, P(b)=1/4
    batch = spark.createDataFrame(
        [(10, "a b"), (11, "a zz")], "doc_id LONG, text STRING"
    )
    got = {
        r.doc_id: (r.n_toks, r.avg_lp)
        for r in unigram_logprob_score(
            batch, freq=freq, total=total
        ).collect()
    }
    lp_a, lp_b = math.log(3 / 4), math.log(1 / 4)
    assert got[10] == (2, round((lp_a + lp_b) / 2, 6))
    assert got[11] == (1, round(lp_a, 6))  # zz unknown -> dropped


def test_null_text_scores_like_empty(spark):
    """NULL text must behave exactly like '' in every text function —
    in particular quality_score(NULL) must be 0.0, not the 0.5 that
    PASSES the >=0.5 quality gates while '' is dropped."""
    from merkonvectordb_spark.functions.text import (
        bpe_token_count,
        doc_fingerprint,
        lang_id,
        quality_score,
        token_count,
    )

    df = spark.createDataFrame([(None,), ("",)], "t STRING")
    rows = df.select(
        quality_score(F.col("t")).alias("q"),
        token_count(F.col("t")).alias("tc"),
        bpe_token_count(F.col("t")).alias("bc"),
        lang_id(F.col("t")).alias("lang"),
        doc_fingerprint(F.col("t")).alias("fp"),
    ).collect()
    assert rows[0] == rows[1]  # NULL behaves exactly like ''
    assert rows[0]["q"] == 0.0 and rows[0]["tc"] == 0 and rows[0]["bc"] == 0
    assert rows[0]["lang"] == "und" and rows[0]["fp"] is not None


def test_tokenizer_fertility_invariants(spark, sf_dir):
    """Fertility report: every (lang, source) slice of the corpus is
    covered exactly once, doc counts reconcile with the table, fertility
    ≥ 1 on word-bearing text (a whitespace word yields ≥1 subword), and
    bytes_per_token > 0."""
    import __spark_entry__ as entry
    from merkonvectordb_spark.schema import load_table

    q = entry.queries()["tokenizer_fertility"]
    rows = q(spark, sf_dir).collect()
    assert rows
    docs = load_table(spark, sf_dir, "documents")
    assert sum(r["n_docs"] for r in rows) == docs.count()
    assert len({(r["lang"], r["source"]) for r in rows}) == len(rows)
    for r in rows:
        if r["ws_tokens"] and r["ws_tokens"] > 0:
            assert r["fertility"] >= 1.0, r
        if r["bpe_tokens"] and r["bpe_tokens"] > 0:
            assert r["bytes_per_token"] > 0.0, r


def test_bigram_score_prefers_fluent_word_order(spark):
    """Two docs with IDENTICAL token multisets: the one whose bigrams
    match the corpus-dominant pattern must score higher — the signal
    the unigram model is blind to (it scores both identically)."""
    import math

    from merkonvectordb_spark.operators.lm import bigram_logprob_score

    corpus = [(i, "a b a b a b a b") for i in range(8)]
    corpus += [(100, "a b a b a b a b"), (101, "b a b a a a b b")]
    docs = spark.createDataFrame(corpus, "doc_id INT, text STRING")
    got = {
        r.doc_id: r.avg_lp
        for r in bigram_logprob_score(docs, "doc_id", "text").collect()
    }
    assert got[100] > got[101]
    # sanity: n_bigrams = tokens - 1 for every doc (8 tokens → 7)
    nb = {
        r.doc_id: r.n_bigrams
        for r in bigram_logprob_score(docs, "doc_id", "text").collect()
    }
    assert set(nb.values()) == {7}


def test_bigram_score_drops_short_docs(spark):
    from merkonvectordb_spark.operators.lm import bigram_logprob_score

    docs = spark.createDataFrame(
        [(1, "hello world"), (2, "solo"), (3, ""), (4, None)],
        "doc_id INT, text STRING",
    )
    got = {r.doc_id for r in bigram_logprob_score(docs).collect()}
    assert got == {1}


def test_char_entropy_collapses_on_boilerplate(spark):
    """Repeated-symbol boilerplate must collapse toward 0 while prose
    sits near ln(alphabet-in-use); NULL/empty/out-of-alphabet text is
    0 (no distribution to measure)."""
    import math

    from merkonvectordb_spark.functions.text import char_entropy_nano

    df = spark.createDataFrame(
        [
            (1, "aaaaaaaaaaaa"),
            (2, "abababababab"),
            (3, "the quick brown fox jumps over the lazy dog"),
            (4, ""),
            (5, None),
            (6, "!!!???!!!"),
        ],
        "i INT, t STRING",
    )
    got = {
        r.i: r.h
        for r in df.select(
            "i", char_entropy_nano(F.col("t")).alias("h")
        ).collect()
    }
    assert got[1] == 0
    assert abs(got[2] / 1e9 - math.log(2)) < 1e-6
    assert got[3] / 1e9 > 2.5
    assert got[4] == 0 and got[5] == 0 and got[6] == 0
    assert got[1] < got[2] < got[3]
