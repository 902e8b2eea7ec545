"""URL canonicalization — pure Catalyst expressions.

No reference counterpart (DeezyMatch is a matcher); this is the
standard web-corpus preprocessing step a Common-Crawl-scale pipeline
needs before URL-level dedup: two crawls of the same page differ in
scheme case, ``www.`` prefix, default ports, tracking query params,
param order, trailing slashes, and fragments, and must collapse to
one canonical key.

Everything here is regexp/array codegen (no ``parse_url``) so the
exact same parsing semantics are expressible in the DuckDB oracle —
Java regex and RE2 agree on the subset used (character classes,
anchors, groups; no lookaround).

Canonical form:
  * scheme and host lowercased; leading ``www.`` stripped
  * default ports dropped (``:80`` for http, ``:443`` for https)
  * fragment dropped
  * path: empty → ``/``; trailing ``/`` stripped except the root
  * query: split on ``&``, empty and tracking params dropped
    (``utm_*``, ``gclid``, ``fbclid``, ``msclkid``, ``ref``),
    remainder sorted lexicographically and rejoined
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["canonical_url", "TRACKING_PARAM_REGEX"]

# params that never distinguish page identity (analytics/click ids).
# Anchored regex over one "k=v" (or bare "k") query fragment.
TRACKING_PARAM_REGEX = r"^(utm_[a-z0-9_]*|gclid|fbclid|msclkid|ref)(=.*)?$"

_SCHEME_RE = r"^([a-zA-Z][a-zA-Z0-9+.\-]*)://"


def canonical_url(url) -> Column:
    """Canonical form of a URL column — a single codegen projection
    (regexp + array ops, no UDF, no shuffle). Rows that do not look
    like ``scheme://host...`` come back unchanged apart from trim +
    fragment strip, so malformed rows stay distinct instead of
    colliding on an empty key."""
    url = F.col(url) if isinstance(url, str) else url
    u = F.trim(url)
    # fragment never reaches the server — drop it before parsing
    u = F.regexp_replace(u, r"#.*$", "")

    scheme = F.lower(F.regexp_extract(u, _SCHEME_RE, 1))
    rest = F.regexp_replace(u, _SCHEME_RE, "")
    hostport = F.lower(F.regexp_extract(rest, r"^([^/?#]*)", 1))
    path = F.regexp_extract(rest, r"^[^/?#]*([^?#]*)", 1)
    query = F.regexp_extract(rest, r"^[^?#]*\?([^#]*)", 1)

    host = F.regexp_replace(hostport, r"^www\.", "")
    host = F.when(scheme == "http", F.regexp_replace(host, r":80$", "")).otherwise(host)
    host = F.when(scheme == "https", F.regexp_replace(host, r":443$", "")).otherwise(host)

    path = F.when(path == "", F.lit("/")).otherwise(path)
    path = F.when(path != "/", F.regexp_replace(path, r"/$", "")).otherwise(path)

    kept = F.array_sort(
        F.filter(
            F.split(query, "&", -1),
            lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_REGEX),
        )
    )
    qcanon = F.array_join(kept, "&")

    canon = F.concat(
        scheme,
        F.lit("://"),
        host,
        path,
        F.when(qcanon != "", F.concat(F.lit("?"), qcanon)).otherwise(F.lit("")),
    )
    return F.when(scheme == "", u).otherwise(canon)
