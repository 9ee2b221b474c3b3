"""String normalization helpers (SURVEY §2.6 F5; reference
Text/StringExtensions.cs:9-26)."""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def normalize_line_endings(c: Column) -> Column:
    """CRLF → LF (StringExtensions.NormalizeLineEndings,
    Text/StringExtensions.cs:13-19).  Literal replace — no regex engine
    in the loop."""
    return F.replace(c, F.lit("\r\n"), F.lit("\n"))


def is_null_or_empty(c: Column) -> Column:
    """NULL-or-empty predicate (StringExtensions.IsNullOrEmpty,
    Text/StringExtensions.cs:9-11) — the guard the store applies to keys
    (SURVEY §2.2 P4)."""
    return c.isNull() | (c == "")
