"""Text-analysis functions for the LLM-data-pipeline surface.

All pure built-in expressions (JVM-side, codegen'd) — no Python UDFs in
any of these paths, so they run at parquet-scan speed on a 100 TB
``documents`` table.  Formulas are deliberately closed-form so a DuckDB
oracle can replicate them exactly (the driver's t2 gate hash-compares
results).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# small marker-word dictionaries for the language-ID heuristic.  Accuracy is
# a non-goal on synthetic fixtures; determinism and scale-shape are the
# point (a real deployment swaps in a fastText-style model via pandas_udf).
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "mit"),
    "en": ("the", "a", "of", "and", "is", "to", "in", "that"),
    "es": ("el", "la", "de", "que", "y", "los", "un", "por"),
    "fr": ("le", "la", "et", "les", "des", "un", "une", "que"),
}

TOKEN_REGEX = r"[a-z0-9]+|[^a-z0-9\s]"  # BPE-ish: word pieces or single punct


def tokenize(text: Column) -> Column:
    """Lowercased whitespace tokens (empty strings filtered).

    NULL text tokenizes to [] — without the coalesce, a NULL propagates
    to a NULL array and ``size()`` then yields -1, poisoning every
    downstream count.  (Raw SQL mirrors reading a NULL-bearing corpus
    would need the same COALESCE; the fixtures carry no NULLs.)"""
    return F.filter(
        F.split(F.lower(F.trim(F.coalesce(text, F.lit("")))), r"\s+"),
        lambda t: t != F.lit(""),
    )


def token_count(text: Column) -> Column:
    """Whitespace token count."""
    return F.size(tokenize(text))


def bpe_token_count(text: Column) -> Column:
    """BPE-ish token count: alnum runs + individual punctuation marks.
    NULL text counts 0 (same coalesce rule as ``tokenize``)."""
    return F.size(
        F.regexp_extract_all(
            F.lower(F.coalesce(text, F.lit(""))), F.lit(TOKEN_REGEX), 0
        )
    )


def _marker_hits(text: Column, words: tuple[str, ...]) -> Column:
    pat = r"\b(" + "|".join(words) + r")\b"
    # NULL-safe like tokenize: a NULL text has 0 marker hits, not NULL
    return F.size(
        F.regexp_extract_all(
            F.lower(F.coalesce(text, F.lit(""))), F.lit(pat), 0
        )
    )


def lang_id(text: Column) -> Column:
    """Marker-word language ID: argmax of per-language stopword hit counts,
    deterministic alphabetical tie-break, 'und' (undetermined) when no
    marker hits at all."""
    scored = [
        F.struct(_marker_hits(text, words).alias("hits"), F.lit(lang).alias("lang"))
        for lang, words in sorted(LANG_MARKERS.items())
    ]
    # array_max on struct compares fieldwise: hits first, then lang.
    # For the alphabetical-on-tie rule we want the SMALLEST lang among the
    # max hits, so compare (hits, negated-rank) — simpler: reverse-sort langs
    # and let max pick the later struct only on strictly more hits.
    best = F.array_max(
        F.array(
            *[
                F.struct(
                    s["hits"].alias("hits"),
                    F.lit(-i).alias("rank"),
                    s["lang"].alias("lang"),
                )
                for i, s in enumerate(scored)
            ]
        )
    )
    return F.when(best["hits"] > 0, best["lang"]).otherwise(F.lit("und"))


def quality_score(text: Column) -> Column:
    """Heuristic document quality in [0,1]:
    0.25·len_ok + 0.25·(1-punct_ratio) + 0.25·stopword_signal + 0.25·word_len_ok

    len_ok        — 1 if 200 ≤ chars ≤ 2000 else chars/200 (short) or
                    2000/chars (long), i.e. a plateau with linear falloff
    punct_ratio   — non-alnum-non-space chars / chars
    stopword_sig  — min(1, en-stopword hits / (tokens/10 + 1))
    word_len_ok   — 1 if 3 ≤ mean word len ≤ 10 else 0

    NULL text scores exactly like EMPTY text (0.0): without the
    coalesce, NULL chars made every when() fall to its otherwise arm
    and F.least skip the NULL term — a NULL document scored 0.5 and
    PASSED the ≥0.5 quality gates while '' was dropped.
    """
    text = F.coalesce(text, F.lit(""))
    chars = F.length(text).cast("double")
    toks = token_count(text).cast("double")
    len_ok = (
        F.when(chars < 200.0, chars / 200.0)
        .when(chars > 2000.0, 2000.0 / chars)
        .otherwise(F.lit(1.0))
    )
    punct = F.size(
        F.regexp_extract_all(text, F.lit(r"[^A-Za-z0-9\s]"), 0)
    ).cast("double")
    punct_ratio = F.when(chars > 0.0, punct / chars).otherwise(F.lit(1.0))
    stop_hits = _marker_hits(text, LANG_MARKERS["en"]).cast("double")
    stop_sig = F.least(F.lit(1.0), stop_hits / (toks / 10.0 + 1.0))
    mean_wl = F.when(toks > 0.0, (chars - (toks - 1.0)) / toks).otherwise(F.lit(0.0))
    wl_ok = F.when((mean_wl >= 3.0) & (mean_wl <= 10.0), 1.0).otherwise(0.0)
    return F.round(
        0.25 * len_ok + 0.25 * (1.0 - punct_ratio) + 0.25 * stop_sig + 0.25 * wl_ok,
        6,
    )


def ngrams(tokens: Column, n: int, sep: str = " ") -> Column:
    """n-token shingles from a token array (empty array when < n tokens).

    ``tokens`` is bound ONCE through a lambda variable (the single-element
    ``transform`` wrap): referencing the raw expression inside the inner
    lambda would re-evaluate it per gram — quadratic when ``tokens`` is
    itself a split/filter chain (measured 10× on shingling pipelines)."""

    def _grams(toks: Column) -> Column:
        return F.when(
            F.size(toks) >= n,
            F.transform(
                F.sequence(F.lit(0), F.size(toks) - n),
                lambda i: F.array_join(F.slice(toks, i + 1, n), sep),
            ),
        ).otherwise(F.array().cast("array<string>"))

    return F.element_at(F.transform(F.array(tokens), _grams), 1)


def word_shingles(text: Column, n: int = 3) -> Column:
    """n-word shingles of the lowercased text."""
    return ngrams(tokenize(text), n)


def doc_fingerprint(text: Column) -> Column:
    """Deterministic 128-bit content fingerprint (hex) of the normalized
    text; NULL text fingerprints like the empty string.

    Normalization: lowercase, collapse whitespace runs to single spaces,
    trim.  Equal fingerprints ⇔ near-byte-equal content — the exact-dedup
    key.  (The reference has no dedup; this is the §7.6 pipeline surface.)
    """
    norm = F.trim(
        F.regexp_replace(F.lower(F.coalesce(text, F.lit(""))), r"\s+", " ")
    )
    return F.md5(norm)


# ---------------------------------------------------------------------------
# PII scrubbing (training-data hygiene)
# ---------------------------------------------------------------------------

# Simple character-class patterns only: identical semantics under Java
# regex (Spark) and RE2 (DuckDB), so redaction is engine-portable.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\+?[0-9]{3}[- ][0-9]{3}[- ][0-9]{4}"


def pii_counts(text: Column) -> tuple[Column, Column]:
    """(n_emails, n_phones) occurrence counts."""
    return (
        F.regexp_count(text, F.lit(EMAIL_RE)),
        F.regexp_count(text, F.lit(PHONE_RE)),
    )


def pii_redact(text: Column) -> Column:
    """Replace every email/phone with a typed placeholder token.

    Order matters: emails first, so a phone-looking digit run inside a
    local part can't be half-redacted before the email pattern sees it.
    """
    no_email = F.regexp_replace(text, EMAIL_RE, "<EMAIL>")
    return F.regexp_replace(no_email, PHONE_RE, "<PHONE>")


# fixed symbol set for the character-entropy signal: the 26 letters plus
# space — counts come from length-difference after replace(), so the
# whole computation is exact integers until one micro-rounded ln
ENTROPY_ALPHABET: tuple[str, ...] = tuple("abcdefghijklmnopqrstuvwxyz") + (" ",)


def char_entropy_nano(text: Column) -> Column:
    """Shannon entropy (nats, as BIGINT nano-units) of the lowercased
    character distribution over ``ENTROPY_ALPHABET`` — the classic
    low-entropy screen for repetitive boilerplate ("aaaa…", padded
    separators) that word-level filters miss.

    Construction keeps the cross-engine contract: per-symbol counts are
    ``length(t) − length(replace(t, ch))`` (exact integers, scan-local);
    the total is an integer fold; each term ``−p·ln p`` micro-rounds its
    single ``ln`` call and re-rounds to an integer nano-unit, so the
    27-term sum is associative and the result hash-stable.  Empty /
    NULL / out-of-alphabet-only text yields 0.

    HOF binding discipline (expressions referenced inside a lambda
    re-evaluate PER ELEMENT, and HOFs are CodegenFallback — no
    subexpression elimination): the text binds once through the outer
    single-element transform, and the COUNTS array binds once through
    the inner one, so the 27 replace() scans run exactly once per row;
    only the cheap 27-int total fold re-evaluates inside the term
    lambda."""
    t = F.lower(F.coalesce(text, F.lit("")))

    def _counts(tt: Column) -> Column:
        return F.transform(
            F.array(*[F.lit(ch) for ch in ENTROPY_ALPHABET]),
            lambda ch: (
                F.length(tt) - F.length(F.replace(tt, ch, F.lit("")))
            ).cast("long"),
        )

    def _term(c: Column, tot: Column) -> Column:
        p = c.cast("double") / tot.cast("double")
        lnm = F.floor(F.log(p) * F.lit(1000000.0) + F.lit(0.5)).cast("long")
        return F.floor(
            -(p * (lnm.cast("double") / F.lit(1000000.0))) * F.lit(1e9)
            + F.lit(0.5)
        ).cast("long")

    def _entropy(w: Column) -> Column:
        # w is a bound lambda variable: re-referencing it is free;
        # `tot` is a 27-int fold over it — cheap to re-evaluate per term
        tot = F.aggregate(w, F.lit(0).cast("long"), lambda a, x: a + x)
        return F.aggregate(
            w,
            F.lit(0).cast("long"),
            lambda acc, c: acc
            + F.when((c > 0) & (tot > 0), _term(c, tot)).otherwise(
                F.lit(0).cast("long")
            ),
        )

    return F.transform(
        F.array(t),
        lambda tt: F.transform(F.array(_counts(tt)), _entropy)[0],
    )[0]
