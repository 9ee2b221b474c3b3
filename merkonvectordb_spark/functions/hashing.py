"""THE deterministic cross-engine hash — single definition.

``md5_hash60`` is the 60-bit uniform hash every sketch, dedup, split,
and hashed-feature operator in this repo shares: md5 of the value's
string form, first 15 hex digits, as BIGINT.  Spark
(``conv(substring(md5(x),1,15),16,10)``) and DuckDB
(``CAST('0x'||substring(md5(x),1,15) AS BIGINT)``) produce identical
values, which is what makes each operator oracle-checkable.

It is defined ONCE here because a drift in any copy (digit count, cast,
seed prefix) silently desynchronizes the engines — the callers
(kmv/CMS sketches, MinHash, SimHash, span grams, hashed-TF, hash
splits) would keep running and disagree only in their values.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def md5_hash60(col: Column) -> Column:
    """Deterministic uniform 60-bit hash of a value's string form."""
    return F.conv(
        F.substring(F.md5(col.cast("string")), 1, 15), 16, 10
    ).cast("bigint")
