"""The UDF / UDAF / UDTF extension surface (SURVEY §2.7 gap table: the
reference has none; Spark provides all three).

One working citizen of each kind, with the house rules applied:

* **scalar** — Arrow-batched ``pandas_udf`` (the row-at-a-time Python
  UDF is banned from hot paths; see also functions.vector's cosine).
* **aggregate** — grouped-agg ``pandas_udf`` (Series → scalar type
  hints; a Series → Series signature would silently build a SCALAR udf
  that fails inside groupBy): geometric mean, a reduction SQL has no
  builtin for — yet expressible as ``exp(avg(ln(x)))``, which is
  exactly what makes it oracle-checkable cross-engine.
* **table** — a Python UDTF (Spark 4 ``@udtf``) exploding text into
  numbered sentences.  UDTFs run row-at-a-time in Python: fine for an
  extension point, wrong for a 100 TB hot path — the tests assert the
  JVM explode/split formulation agrees.

Everything here is built LAZILY (factory + cache): ``pandas_udf``
registration requires an active SparkContext, and these modules must be
importable before any session exists (pytest collection, driver
harnesses).
"""

from __future__ import annotations

import math
from functools import lru_cache

# module-level: PEP-563 string annotations ('pd.Series') are resolved in
# the function's GLOBAL namespace when pandas_udf infers the UDF kind —
# a factory-local import leaves them unresolvable
import pandas as pd  # noqa: E402


@lru_cache(maxsize=1)
def char_entropy_udf():
    """Scalar pandas UDF: Shannon entropy (bits/char) of each string —
    a quality signal with no closed-form SQL equivalent."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def char_entropy(s: pd.Series) -> pd.Series:
        def one(x):
            if x is None or len(x) == 0:
                return None
            _, counts = np.unique(list(x), return_counts=True)
            p = counts / counts.sum()
            return float(-(p * np.log2(p)).sum())

        return s.map(one)

    return char_entropy


@lru_cache(maxsize=1)
def geometric_mean_udf():
    """Grouped-agg pandas UDF (UDAF): exp(mean(log x)) over positive
    values; NULL for a group with none (the Python NaN crosses the
    Arrow hop as NULL — same convention as functions.vector).  Partial-agg does NOT apply —
    each group's values funnel to one task (the documented UDAF
    trade-off; bucket the key if groups are huge)."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def geometric_mean(v: pd.Series) -> float:
        x = v[v > 0]
        if len(x) == 0:
            return math.nan
        return float(np.exp(np.log(x.astype("float64")).mean()))

    return geometric_mean


@lru_cache(maxsize=1)
def group_size_udf():
    """Companion UDAF: group row count.  Exists because Spark refuses
    to mix grouped-agg pandas UDFs with JVM aggregates in one agg() —
    an all-pandas aggregation list is the workaround."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("long")
    def group_size(v: pd.Series) -> int:
        return len(v)

    return group_size


@lru_cache(maxsize=1)
def sentence_udtf():
    """Table function: text → (sent_idx, sentence) rows."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="sent_idx INT, sentence STRING")
    class SplitSentences:
        def eval(self, text: str):  # noqa: D401
            if text is None:
                return
            parts = [
                p.strip()
                for p in text.replace("!", ".").replace("?", ".").split(".")
            ]
            for i, p in enumerate(x for x in parts if x):
                yield i, p

    return SplitSentences
