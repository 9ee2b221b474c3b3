"""Training-data pipeline operators: deterministic dataset splitting
and token-window document chunking.

Both are pure JVM-side expression compositions (no Python UDFs) whose
outputs are content-addressed — a row's split assignment and a doc's
chunk boundaries depend only on the data, never on partitioning, task
order, or a random seed's partition placement.  That is the property a
100 TB training pipeline actually needs: re-running the job, adding
executors, or re-partitioning the input must not move examples between
train and validation (``sample()``'s Bernoulli draw is seeded per
partition and does exactly that).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# md5-derived 60-bit uniform hash — same construct as operators.sketch,
# expressible identically in DuckDB for oracle parity.
def _hash60(col: Column) -> Column:
    return F.conv(F.substring(F.md5(col.cast("string")), 1, 15), 16, 10).cast(
        "bigint"
    )


def hash_split(
    df: DataFrame,
    key_col: str,
    splits: dict[str, int],
    salt: str = "",
) -> DataFrame:
    """Assign every row to a named split by hashing its key.

    ``splits`` maps name → integer weight (e.g. ``{"train": 90,
    "val": 5, "test": 5}``); a row lands in the split owning its hash
    bucket ``h % total_weight``.  Deterministic, partition-independent,
    and stable across reruns — and because the assignment is a pure
    function of the key, a document's chunks/augmentations hash to the
    same split as their parent when keyed consistently.  ``salt``
    re-deals the assignment without touching the data.

    Adds a ``split`` column; no shuffle (a projection over the scan).
    """
    total = sum(splits.values())
    if total <= 0 or any(w < 0 for w in splits.values()):
        raise ValueError("split weights must be non-negative with a positive sum")
    bucket = F.pmod(_hash60(F.concat(F.col(key_col).cast("string"), F.lit(salt))), F.lit(total))
    expr = None
    lo = 0
    for name, w in splits.items():
        cond = (bucket >= lo) & (bucket < lo + w)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
        lo += w
    return df.withColumn("split", expr)


def chunk_tokens(
    df: DataFrame,
    text_col: str = "text",
    window: int = 64,
    stride: int = 48,
) -> DataFrame:
    """Explode documents into overlapping token windows (context-window
    chunking for LLM training): whitespace tokens, chunks of ``window``
    tokens every ``stride`` (overlap = window − stride).

    Shape: tokenize once, generate chunk starts with ``sequence`` (a
    row generator, not a per-element lambda — HOF array *builders* are
    CodegenFallback, see functions/text.py), explode, then ``slice`` +
    ``concat_ws`` rebuild each chunk.  Cost is rows × tokens/stride —
    linear, no shuffle; every downstream op sees one row per chunk.
    """
    if window <= 0 or stride <= 0 or stride > window:
        raise ValueError("need 0 < stride <= window")
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    out = (
        df.where(F.length(F.trim(F.col(text_col))) > 0)
        .withColumn("__toks", toks)
        .withColumn(
            "__start",
            F.explode(
                F.sequence(
                    F.lit(0),
                    F.greatest(F.size("__toks") - 1, F.lit(0)),
                    F.lit(stride),
                )
            ),
        )
    )
    return (
        out.select(
            *df.columns,
            (F.col("__start") / stride).cast("bigint").alias("chunk_idx"),
            F.least(
                F.lit(window), F.size("__toks") - F.col("__start")
            ).alias("chunk_tokens"),
            F.concat_ws(
                " ", F.slice("__toks", F.col("__start") + 1, window)
            ).alias("chunk_text"),
        )
    )
