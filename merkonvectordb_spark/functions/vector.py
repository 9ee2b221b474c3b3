"""Vector math as Catalyst expressions (+ a pandas_udf fast path).

Reference behavior being re-expressed: float32 cosine similarity
(``TensorPrimitives.CosineSimilarity``, MerkonMemoryStore.cs:137) — NaN on
zero-norm vectors, used with an inclusive ``>=`` relevance threshold
(MerkonMemoryStore.cs:138).

Design notes for 100 TB scale:

* The default ``cosine_similarity`` is pure built-in expressions
  (``zip_with`` + ``aggregate``) — it runs JVM-side inside whole-stage
  codegen, no Python worker, no Arrow hop.  Summation is sequential in
  element order, in DOUBLE, so results are deterministic and bit-identical
  to any other engine that folds left-to-right in double (the DuckDB
  oracle's ``list_dot_product`` over ``DOUBLE[]`` matches).
* ``cosine_similarity_pandas`` is the Arrow/numpy batch path: for very wide
  embeddings (d ≥ ~512) numpy's SIMD dot beats the per-element codegen
  loop.  Same semantics (NaN on zero norm), float64 accumulation.
* Pre-normalizing the corpus once (``l2_normalize`` at ingest) turns every
  query's cosine into a plain dot product — at scale that halves the
  per-query FLOPs and is the layout a real deployment should use.
"""

from __future__ import annotations

from collections.abc import Sequence

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql import types as T


def vector_literal(values: Sequence[float]) -> Column:
    """A literal ARRAY<DOUBLE> column from a Python sequence (query vector).

    Uses a single array literal (one expression node) rather than one
    ``lit()`` per dimension — at d=1536 a per-element construction bloats
    the expression tree and the codegen'd method size.
    """
    return F.lit([float(v) for v in values])


def dot_product(a: Column, b: Column) -> Column:
    """Sequential-fold dot product in DOUBLE: deterministic summation order."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(dot_product(a, a))


def l2_normalize(a: Column) -> Column:
    """L2-normalize; zero-norm vectors normalize to NULL (guarded).

    The norm is BOUND ONCE via the single-element-array wrap: referencing
    the ``l2_norm`` fold directly inside the per-element ``transform``
    lambda would re-evaluate it for every element — O(d²) per row (the
    repo's documented HOF-lambda re-eval trap; cf. functions/text.py
    ``ngrams``)."""
    return F.element_at(
        F.transform(
            F.array(l2_norm(a)),
            lambda n: F.when(
                n > 0.0, F.transform(a, lambda x: x.cast("double") / n)
            ),
        ),
        1,
    )


def cosine_similarity(a: Column, b: Column) -> Column:
    """Cosine similarity in DOUBLE; NULL when either norm is zero.

    The reference's ``TensorPrimitives.CosineSimilarity`` yields NaN on
    zero-norm input, which then fails the inclusive ``>=`` threshold
    (MerkonMemoryStore.cs:137-138) — the row is excluded.  We represent
    "unscorable" as NULL in BOTH scoring paths (expression and pandas):
    NULL fails ``>=`` identically, so observable behavior matches the
    reference, and the two paths can't diverge (Arrow converts float NaN
    to NULL on the pandas→JVM hop, so NULL is the only representation the
    pandas path can produce anyway).
    """
    denom = l2_norm(a) * l2_norm(b)
    return F.when(denom > 0.0, dot_product(a, b) / denom)


def cosine_similarity_pandas(query: Sequence[float]):
    """Arrow-batched numpy cosine vs a fixed query vector.

    Returns a pandas_udf Column-builder: ``df.withColumn("score",
    cosine_similarity_pandas(q)(F.col("embedding")))``.  The query vector is
    captured in the closure (small — pickled once per task, not per row).
    ~10-100× over row-at-a-time Python; on par with or better than the
    codegen loop for wide vectors.

    Zero-norm rows (either side) produce NULL — same semantics as
    ``cosine_similarity`` (np.nan becomes NULL across the Arrow boundary).
    """
    import numpy as np

    q = np.asarray(list(query), dtype=np.float64)
    qn = float(np.sqrt((q * q).sum()))

    @F.pandas_udf(T.DoubleType())
    def _cos(col: pd.Series) -> pd.Series:
        # stack the Arrow list column into a (batch, dim) matrix
        mat = np.vstack(col.to_numpy())
        if mat.dtype != np.float64:
            mat = mat.astype(np.float64)
        norms = np.sqrt((mat * mat).sum(axis=1)) * qn
        with np.errstate(divide="ignore", invalid="ignore"):
            out = (mat @ q) / norms
        out[norms == 0.0] = np.nan  # NaN → NULL across Arrow: the contract
        return pd.Series(out)

    return _cos
