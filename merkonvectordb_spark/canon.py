"""THE canonicalization for oracle comparisons — single source of truth.

Both the local gate stand-in (``tools/oracle_check.py``) and the
in-process driver instrumentation (``merkonvectordb_spark/probe.py``)
hash result sets through these functions.  They exist exactly once so
the probe's verdicts can never desynchronize from the gate's: a hash
match reported by one means the same bytes were hashed by the other.
"""

from __future__ import annotations

import hashlib
from datetime import date, datetime


def canon_cell(v) -> str:
    if v is None:
        return "\\N"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        if v != v:
            return "NaN"
        # driver-style float canonicalization: short round-trip repr
        return repr(round(v, 9))
    if isinstance(v, datetime):
        return v.strftime("%Y-%m-%d %H:%M:%S.%f")
    if isinstance(v, date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return "[" + ",".join(canon_cell(x) for x in v) + "]"
    return str(v)


def canon_rows(cols: list, rows: list) -> tuple[str, list[str]]:
    """Order-insensitive canonical form: columns sorted by name, rows
    sorted by their canonical line.  Returns (sha256, sorted lines)."""
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted(
        "\x1f".join(canon_cell(r[i]) for i in order) for r in rows
    )
    h = hashlib.sha256("\n".join(lines).encode()).hexdigest()
    return h, lines
