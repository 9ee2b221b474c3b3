"""URL normalization and domain extraction — pure JVM expressions.

Web-scale corpora (Common Crawl and descendants) are curated per
*registered domain*: URL-level dedup, per-domain document caps, and
domain block/allow lists all key on a canonical form of the URL.  These
helpers are scan-local column expressions (no UDF, no shuffle) so the
canonicalization rides inside whole-stage codegen on the ingest scan.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column
from pyspark.sql import functions as F

#: public-suffix heuristic: country-code second-level suffixes under
#: which the registered domain needs THREE labels, not two.  (A full
#: public-suffix list is a data file, not code; this is the documented
#: fallback when that list isn't mounted.)
TWO_LEVEL_SUFFIXES: tuple[str, ...] = (
    "co.uk",
    "com.au",
    "co.jp",
    "com.br",
    "co.in",
)


def normalize_url(url: Column) -> Column:
    """Canonical URL: lowercase, scheme and leading ``www.`` stripped,
    query string / fragment dropped, trailing slashes trimmed.

    ``http://WWW.Ex.CO.UK/p/1/?utm=x#top`` → ``ex.co.uk/p/1``.  Two
    URLs that normalize equal are the same page for dedup purposes —
    the standard crawl-dedup equivalence, deliberately coarser than
    byte equality."""
    u = F.lower(url)
    u = F.regexp_replace(u, r"^https?://", "")
    u = F.regexp_replace(u, r"^www\.", "")
    u = F.regexp_replace(u, r"[?#].*$", "")
    return F.regexp_replace(u, r"/+$", "")


def url_host(norm_url: Column) -> Column:
    """Host part of an already-normalized URL: everything before ``/``,
    with userinfo (``user@``) and an explicit port (``:8080``) stripped
    — ``example.com:8080`` and ``example.com`` are the SAME host, or
    per-domain caps and blocklists silently miss port-bearing URLs."""
    authority = F.regexp_extract(norm_url, r"^([^/]+)", 1)
    no_user = F.regexp_replace(authority, r"^[^/@]*@", "")
    return F.regexp_replace(no_user, r":\d+$", "")


def registered_domain(host: Column) -> Column:
    """Registered (pay-level) domain of a host: the last two labels,
    or three when the suffix is a known two-level country suffix
    (``a.b.co.uk`` → ``b.co.uk``, ``a.b.example.com`` → ``example.com``)."""
    labels = F.split(host, r"\.")
    last2 = F.array_join(F.slice(labels, -2, 2), ".")
    last3 = F.array_join(F.slice(labels, -3, 3), ".")
    is_two_level = reduce(
        lambda a, b: a | b,
        [host.endswith("." + s) for s in TWO_LEVEL_SUFFIXES],
    )
    return (
        F.when(F.size(labels) < 2, host)  # dotless hosts ARE the domain
        .when(is_two_level & (F.size(labels) >= 3), last3)
        .otherwise(last2)
    )
