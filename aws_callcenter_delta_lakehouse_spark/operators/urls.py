"""URL canonicalization — the normalization pass web-corpus pipelines
run before URL-level dedup (CommonCrawl-style: the same page is
crawled as ``HTTP://Www.Site.com/a/?utm_source=x`` and
``http://www.site.com/a``; canonical-form equality is the dedup key).

Rules (the standard, conservative subset):
  - scheme and host lowercase
  - default ports stripped (``:80`` for http, ``:443`` for https)
  - fragment dropped
  - tracking query params dropped (``utm_*``, ``fbclid``, ``gclid``),
    remaining params sorted (query order is almost never semantic)
  - trailing slash normalized off the path (bare root stays ``/``)

Everything is built-in string/array expressions — JVM-side,
codegen-friendly, per-row map with no shuffle; the dedup that follows
is the ordinary hash-aggregate on the canonical string. The DuckDB
mirror in ``dedup_url_canonical`` reproduces each rule with the same
regexes, so the diff pins rule-for-rule parity.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# '=' is optional (trailing $ alternative): valueless tracking params
# ('?fbclid', '?utm_source&id=1') must canonicalize away too
TRACKING_RE = "^(utm_[^=&]*|fbclid|gclid)(=|$)"


def canonicalize_url(url: Column) -> Column:
    """Canonical form of an absolute http(s) URL (see module rules).
    Non-URL strings (no ``scheme://``) come back unchanged-ish: empty
    scheme/host yield an empty prefix, which keeps the expression
    total — callers filter or validate upstream if they need to."""
    scheme = F.lower(F.regexp_extract(url, r"^([A-Za-z][A-Za-z0-9+.-]*)://", 1))
    host0 = F.lower(F.regexp_extract(url, r"^[^:]+://([^/?#]+)", 1))
    host = F.when(
        scheme == "http", F.regexp_replace(host0, ":80$", "")
    ).when(
        scheme == "https", F.regexp_replace(host0, ":443$", "")
    ).otherwise(host0)
    path0 = F.regexp_extract(url, r"^[^:]+://[^/?#]+([^?#]*)", 1)
    path = F.regexp_replace(path0, "/+$", "")
    query = F.regexp_extract(url, r"\?([^#]*)", 1)
    kept = F.array_sort(
        F.filter(
            F.split(query, "&"),
            lambda p: (p != "") & ~p.rlike(TRACKING_RE),
        )
    )
    qs = F.array_join(kept, "&")
    return F.concat(
        scheme,
        F.lit("://"),
        host,
        F.when(path == "", F.lit("/")).otherwise(path),
        F.when(qs == "", F.lit("")).otherwise(F.concat(F.lit("?"), qs)),
    )
