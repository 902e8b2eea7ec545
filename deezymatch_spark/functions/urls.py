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

Implementation note — the let-binding trick: composing this as one
Python Column tree pastes the shared parse chain (trim → fragment
strip → scheme/host/path/query extracts) into every consumer, the
same expression-duplication trap as PLANS.md #1, and measured 1.7×
slower end-to-end. ``_let`` binds an intermediate as a
higher-order-function lambda argument, which Catalyst evaluates
exactly once per row (lambda variables are never inlined); the whole
canonicalizer stays a single shuffle-free Project.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from .expr import let_ as _let

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
    # fragment never reaches the server — drop it before parsing
    u0 = F.regexp_replace(F.trim(url), r"#.*$", "")
    return _let(u0, _canon_of)


def _canon_of(u: Column) -> Column:
    parts = F.struct(
        F.lower(F.regexp_extract(u, _SCHEME_RE, 1)).alias("scheme"),
        F.regexp_replace(u, _SCHEME_RE, "").alias("rest"),
    )

    def with_parts(p: Column) -> Column:
        scheme, rest = p["scheme"], p["rest"]
        raw = F.struct(
            F.lower(F.regexp_extract(rest, r"^([^/?#]*)", 1)).alias("hostport"),
            F.regexp_extract(rest, r"^[^/?#]*([^?#]*)", 1).alias("path0"),
            F.regexp_extract(rest, r"^[^?#]*\?([^#]*)", 1).alias("query0"),
        )

        def with_raw(r: Column) -> Column:
            # (www.)+ so www.www.host collapses in ONE pass — the
            # canonicalizer must be idempotent (a projection onto its
            # own image), locked by test_canonical_url_idempotent
            host0 = F.regexp_replace(r["hostport"], r"^(www\.)+", "")

            def with_host(h: Column) -> Column:
                host = (
                    F.when(scheme == "http", F.regexp_replace(h, r":80$", ""))
                    .when(scheme == "https", F.regexp_replace(h, r":443$", ""))
                    .otherwise(h)
                )
                # strip ALL trailing slashes (idempotence: '/p//' must
                # equal '/p/' post-canon); all-slash or empty → root
                stripped = F.regexp_replace(r["path0"], r"/+$", "")
                path = F.when(stripped == "", F.lit("/")).otherwise(stripped)
                kept = F.array_sort(
                    F.filter(
                        F.split(r["query0"], "&", -1),
                        lambda x: (x != "") & ~x.rlike(TRACKING_PARAM_REGEX),
                    )
                )

                def with_q(q: Column) -> Column:
                    return F.concat(
                        scheme,
                        F.lit("://"),
                        host,
                        path,
                        F.when(q != "", F.concat(F.lit("?"), q)).otherwise(
                            F.lit("")
                        ),
                    )

                return _let(F.array_join(kept, "&"), with_q)

            return _let(host0, with_host)

        return _let(raw, with_raw)

    # malformed (no scheme) → trimmed/defragmented input unchanged
    return F.when(F.regexp_extract(u, _SCHEME_RE, 1) == "", u).otherwise(
        _let(parts, with_parts)
    )
