"""Unit semantics for exact duplicated-span detection / removal
(operators.dedup.duplicated_span_stats / remove_duplicated_spans)."""

from __future__ import annotations

from merkonvectordb_spark.operators.dedup import (
    duplicated_span_stats,
    remove_duplicated_spans,
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _words(prefix, k):
    return " ".join(f"{prefix}{i}" for i in range(k))


def test_planted_cross_doc_span(spark):
    # doc 2 embeds doc 1's full 10-token text inside unique context;
    # n=4 ⇒ 7 duplicated gram positions per occurrence, one run each.
    shared = _words("s", 10)
    df = _docs(
        spark,
        [
            (1, shared),
            (2, _words("a", 6) + " " + shared + " " + _words("b", 6)),
            (3, _words("c", 12)),
        ],
    )
    out = {
        r["doc_id"]: r.asDict()
        for r in duplicated_span_stats(df, "doc_id", "text", 4).collect()
    }
    assert out[1]["n_dup_grams"] == 7  # positions 1..7
    assert out[1]["n_runs"] == 1
    assert out[1]["max_run_tokens"] == 10
    assert out[1]["dup_tokens"] == 10  # whole doc covered
    assert out[2]["n_dup_grams"] == 7
    assert out[2]["dup_tokens"] == 10
    assert out[2]["n_tokens"] == 22
    assert out[3]["n_dup_grams"] == 0
    assert out[3]["dup_tokens"] == 0


def test_short_doc_has_no_grams(spark):
    df = _docs(spark, [(1, "a b c"), (2, "a b c")])
    out = duplicated_span_stats(df, "doc_id", "text", 4).collect()
    assert all(r["n_dup_grams"] == 0 for r in out)
    assert all(r["n_tokens"] == 3 for r in out)


def test_interval_union_counts_overlap_once(spark):
    # Two duplicated runs whose token intervals overlap: with n=4,
    # doc 3 shares grams starting at positions 1..2 (from doc 1) and at
    # position 5 (from doc 2); islands [1,2] and [5] cover tokens
    # [1..5+3] = [1,8] minus nothing — intervals [1,5] and [5,8] overlap
    # at token 5 and must union to 8, not 4+5=9.
    t = "w1 w2 w3 w4 w5 w6 w7 w8"
    toks = t.split()
    df = _docs(
        spark,
        [
            (1, " ".join(toks[0:5])),  # grams at pos 1,2 of doc 3
            (2, " ".join(toks[4:8])),  # gram at pos 5 of doc 3
            (3, t),
        ],
    )
    out = {
        r["doc_id"]: r.asDict()
        for r in duplicated_span_stats(df, "doc_id", "text", 4).collect()
    }
    assert out[3]["n_runs"] == 2
    assert out[3]["dup_tokens"] == 8


def test_removal_keeps_first_occurrence(spark):
    shared = _words("s", 8)
    df = _docs(
        spark,
        [
            (1, shared),  # first occurrence (min doc_id, pos) — kept
            (2, _words("x", 5) + " " + shared),
            (3, _words("y", 9)),
        ],
    )
    out = {
        r["doc_id"]: r.asDict()
        for r in remove_duplicated_spans(df, "doc_id", "text", 4).collect()
    }
    assert out[1]["text_dedup"] == shared
    assert out[1]["n_tokens_after"] == 8
    # doc 2 loses the shared span, keeps its unique prefix
    assert out[2]["text_dedup"] == _words("x", 5)
    assert out[2]["n_tokens_after"] == 5
    assert out[3]["n_tokens_after"] == 9


def test_removal_fully_covered_doc_empties(spark):
    shared = _words("s", 6)
    df = _docs(spark, [(1, shared), (2, shared)])
    out = {
        r["doc_id"]: r.asDict()
        for r in remove_duplicated_spans(df, "doc_id", "text", 4).collect()
    }
    assert out[1]["text_dedup"] == shared
    assert out[2]["text_dedup"] == ""
    assert out[2]["n_tokens_after"] == 0
    assert out[2]["n_tokens_before"] == 6


def test_null_text_doc_emits_empty_contract(spark):
    # contract pin (ADVICE round-9 #3): a NULL-text doc must emit
    # (n_tokens_before=0, n_tokens_after=0, text_dedup='') — never NULL
    # or size(NULL).  tokenize() coalesces NULL → [] internally, so the
    # reassembly path sees an empty array, not a NULL passthrough.
    shared = _words("s", 6)
    df = _docs(spark, [(1, shared), (2, shared), (3, None)])
    out = {
        r["doc_id"]: r.asDict()
        for r in remove_duplicated_spans(df, "doc_id", "text", 4).collect()
    }
    assert out[3]["n_tokens_before"] == 0
    assert out[3]["n_tokens_after"] == 0
    assert out[3]["text_dedup"] == ""
    # the NULL row must not perturb real removal either
    assert out[2]["text_dedup"] == ""
    assert out[1]["text_dedup"] == shared


def test_within_doc_repetition_detected(spark):
    # the same 5-token phrase twice inside ONE doc is a duplicate too
    phrase = _words("p", 5)
    df = _docs(
        spark,
        [(1, phrase + " " + _words("m", 4) + " " + phrase), (2, _words("z", 8))],
    )
    out = {
        r["doc_id"]: r.asDict()
        for r in duplicated_span_stats(df, "doc_id", "text", 4).collect()
    }
    assert out[1]["n_dup_grams"] == 4  # 2 gram positions × 2 occurrences
    assert out[1]["n_runs"] == 2
    assert out[1]["dup_tokens"] == 10
    # removal keeps the FIRST within-doc occurrence
    rem = {
        r["doc_id"]: r.asDict()
        for r in remove_duplicated_spans(df, "doc_id", "text", 4).collect()
    }
    assert rem[1]["text_dedup"] == phrase + " " + _words("m", 4)
