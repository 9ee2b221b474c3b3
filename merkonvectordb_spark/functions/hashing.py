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

import hashlib as _hashlib

from pyspark.sql import Column
from pyspark.sql import functions as F

_md5 = _hashlib.md5


def md5_hash60(col: Column) -> Column:
    """Deterministic uniform 60-bit hash of a value's string form."""
    return F.conv(
        F.substring(F.md5(col.cast("string")), 1, 15), 16, 10
    ).cast("bigint")


def py_md5_hash60(data: bytes) -> int:
    """The SAME 60-bit fold, computed Python-side (pandas-UDF paths that
    hash raw bytes: media feature stubs, char-gram keys).  Must stay the
    exact md5[:15] fold ``md5_hash60`` compiles into Catalyst — a drift
    between the two desynchronizes pandas-path operators from their
    expression-path siblings and the DuckDB oracles.

    Module-level md5 binding, no per-call import: this runs once PER
    GRAM in hot pandas loops (~10M calls per sf0.1 dedup run — a
    per-call ``import`` statement alone measured seconds)."""
    return int(_md5(data).hexdigest()[:15], 16)
