"""Corpus language-model scoring: the CCNet-style perplexity-proxy
filter, with the LM trained and applied in one distributed pass.

Web-scale curation pipelines score every document by how "natural" its
text is under a language model and drop the tails (boilerplate, menus,
gibberish score low; fluent prose scores high).  The full method uses a
trained n-gram LM; the distributable skeleton — and a surprisingly
strong baseline — is a UNIGRAM model estimated from the corpus itself:

    score(doc) = (1/|doc|) · Σ_token  ln P(token),
    P(token)   = corpus_count(token) / corpus_tokens

Plan shape: one explode of the corpus into tokens, one (token)
aggregation for the model, one (token) hash join to attach
probabilities, one (doc) aggregation for the scores — every stage
partial-aggregates, the model is itself a DataFrame (at 100 TB the
vocabulary does not fit the driver, so there is no broadcast-the-vocab
step; the join shuffles on token like any fact-fact join and AQE
handles the skew of stopword tokens).  The token total is the only
driver value (one row).

No external model artifacts: the LM is the corpus' own statistics, so
the operator is deterministic and oracle-checkable end to end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from merkonvectordb_spark.functions.text import tokenize


def unigram_model(
    docs: DataFrame, text_col: str = "text"
) -> tuple[DataFrame, DataFrame]:
    """``(freq, total)``: per-token counts and the 1-row corpus total.

    ``total`` is DERIVED from ``freq`` (Σc), not a second aggregation
    over the corpus — the two branches would otherwise each re-scan and
    re-tokenize the corpus (Spark does not dedupe identical subplans)."""
    toks = docs.select(
        F.explode(tokenize(F.col(text_col))).alias("token")
    )
    freq = toks.groupBy("token").agg(F.count(F.lit(1)).alias("c"))
    total = freq.agg(F.sum("c").alias("t"))
    return freq, total


def unigram_logprob_score(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    freq: DataFrame | None = None,
    total: DataFrame | None = None,
) -> DataFrame:
    """``(id_col, n_toks, avg_lp)`` — mean token log-probability per doc.

    Pass a pre-computed ``freq`` (e.g. from a larger reference corpus,
    or reused across batches) to score against a FIXED model; ``total``
    is derived from it when omitted.  By default the model is estimated
    from ``docs`` itself.  Tokens absent from the model drop out of the
    average (with the self-model default every token is present).

    Passing ``total`` without ``freq`` raises: silently re-estimating
    the model from the batch would score against the WRONG model with
    no error."""
    if freq is None and total is not None:
        raise ValueError(
            "total without freq — pass the freq table (total is "
            "derivable from it), or neither for the self-model"
        )
    if freq is not None and total is None:
        total = freq.agg(F.sum("c").alias("t"))
    if freq is None:
        freq, total = unigram_model(docs, text_col)
    toks = docs.select(
        F.col(id_col), F.explode(tokenize(F.col(text_col))).alias("token")
    )
    lp = F.log(F.col("c").cast("double") / F.col("t").cast("double"))
    return (
        toks.join(freq, "token")
        .crossJoin(F.broadcast(total))
        .select(F.col(id_col), lp.alias("__lp"))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_toks"),
            F.round(F.avg("__lp"), 6).alias("avg_lp"),
        )
    )



def _token_pairs(toks):
    """(w1, w2) struct array from a token array — ONE definition of the
    slice/zip pair extraction shared by the model builder and the
    scoring stream: the two must stay byte-identical or the self-model
    join silently stops covering every stream pair."""
    return F.zip_with(
        F.slice(toks, 1, F.greatest(F.size(toks) - 1, F.lit(0))),
        F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0))),
        lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
    )


def bigram_model(
    docs: DataFrame, text_col: str = "text"
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """``(bigrams, freq, total)``: corpus (w1, w2) pair counts, unigram
    counts, and the 1-row token total — the statistics an interpolated
    bigram LM needs.  Pair extraction is scan-local (zip of two array
    slices, no shuffle); both count tables partial-aggregate."""
    toks = docs.select(tokenize(F.col(text_col)).alias("t"))
    pairs = toks.select(
        F.explode(_token_pairs(F.col("t"))).alias("p")
    ).select("p.w1", "p.w2")
    bigrams = pairs.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c2"))
    freq = docs.select(
        F.explode(tokenize(F.col(text_col))).alias("token")
    ).groupBy("token").agg(F.count(F.lit(1)).alias("c"))
    total = freq.agg(F.sum("c").alias("t"))
    return bigrams, freq, total


def bigram_logprob_score(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    lam: float = 0.7,
) -> DataFrame:
    """``(id_col, n_bigrams, avg_lp)`` — mean bigram log-probability per
    document under the Jelinek-Mercer interpolated self-model

        P(w2|w1) = λ·c(w1,w2)/c(w1) + (1−λ)·c(w2)/T

    — one rung up the CCNet ladder from ``unigram_logprob_score``
    (conditioning on the previous token separates fluent word ORDER
    from fluent word CHOICE; boilerplate with plausible vocabulary but
    shuffled syntax scores low here and fine there).  Documents with
    fewer than two tokens have no bigram and drop out.

    Determinism: the interpolation is one fixed expression tree over
    exact integer counts; ``ln`` (the one libm call) micro-rounds per
    bigram, and the per-doc mean is an exact BIGINT sum over an exact
    count, divided once.

    Scale shape: pair extraction is scan-local; the model tables are
    DataFrames joined on their keys (never driver-broadcast vocab);
    the score pass shuffles the bigram stream three times (pair join +
    two unigram joins) with AQE handling stopword-pair skew; the final
    per-doc aggregation partial-aggregates."""
    bigrams, freq, total = bigram_model(docs, text_col)
    toks = docs.select(F.col(id_col), tokenize(F.col(text_col)).alias("t"))
    stream = toks.select(
        F.col(id_col),
        F.explode(_token_pairs(F.col("t"))).alias("p"),
    ).select(F.col(id_col), "p.w1", "p.w2")
    c1w1 = freq.select(F.col("token").alias("w1"), F.col("c").alias("cw1"))
    c1w2 = freq.select(F.col("token").alias("w2"), F.col("c").alias("cw2"))
    p = (
        F.lit(lam) * F.col("c2").cast("double") / F.col("cw1").cast("double")
        + F.lit(1.0 - lam)
        * F.col("cw2").cast("double")
        / F.col("t").cast("double")
    )
    lp_micro = F.floor(F.log(p) * F.lit(1000000.0) + F.lit(0.5)).cast("long")
    return (
        stream.join(bigrams, ["w1", "w2"])
        .join(c1w1, "w1")
        .join(c1w2, "w2")
        .crossJoin(F.broadcast(total))
        .select(F.col(id_col), lp_micro.alias("__lpm"))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_bigrams"),
            F.round(
                (F.sum("__lpm").cast("double")
                 / F.count(F.lit(1)).cast("double"))
                / F.lit(1000000.0),
                6,
            ).alias("avg_lp"),
        )
    )
