"""Domain blocklist filtering (UT1 / RefinedWeb-style URL curation).

Every production web-corpus pipeline runs a domain blocklist pass
before content filtering (RefinedWeb §3.1, FineWeb: the UT1 adult
list, ~4M registrable domains). The match rule is suffix-at-label
boundary: host ``a.b.example.com`` is blocked by ``example.com`` but
NOT by ``ample.com``. No reference counterpart (DeezyMatch never sees
URLs).

Spark shape: the host's dot-suffix chain (``a.b.c`` → [``a.b.c``,
``b.c``, ``c``]) is a tiny array (≈ label count) built shuffle-free
with transform-over-sequence codegen. Two matching modes:

- **literal list** (≤ ~10k domains): ``arrays_overlap`` against one
  array literal — zero joins, zero shuffles, pushes into the scan.
- **table** (millions of domains): explode the suffix chain and
  semi/anti-join the blocklist table on the suffix — one join keyed on
  the suffix, blocklist on the build side (broadcast when it fits, a
  shuffle join when it doesn't); the corpus side carries only
  (row, suffix) pairs, ~5 rows per doc.

Host extraction reuses the canonicalizer's regex subset (Java ∩ RE2,
so the DuckDB oracle replicates it verbatim): lowercase, scheme and
port stripped, leading ``www.`` dropped. Unparseable/empty hosts are
never blocked (they carry no domain evidence); drop them with an
explicit filter if the policy says so.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

__all__ = ["url_host", "host_suffixes", "blocked_domains", "domain_filter"]

_SCHEME_RE = r"^[a-zA-Z][a-zA-Z0-9+.\-]*://"


def url_host(url) -> Column:
    """→ lowercased host of ``url``: scheme, port, path, query,
    fragment stripped; leading ``www.`` labels dropped. '' when absent."""
    u = F.col(url) if isinstance(url, str) else url
    rest = F.regexp_replace(F.trim(u), _SCHEME_RE, "")
    host = F.lower(F.regexp_extract(rest, r"^([^/?#:]*)", 1))
    return F.regexp_replace(host, r"^(www\.)+", "")


def host_suffixes(host) -> Column:
    """→ array<string> of the host's dot-suffixes at label boundaries,
    longest first (``a.b.c`` → [a.b.c, b.c, c]); empty for ''."""
    h = F.col(host) if isinstance(host, str) else host
    parts = F.split(h, r"\.")
    n = F.size(parts)
    return F.when(h == "", F.array().cast("array<string>")).otherwise(
        F.transform(
            F.sequence(F.lit(0), n - 1),
            lambda i: F.array_join(F.slice(parts, i + 1, n - i), "."),
        )
    )


def blocked_domains(
    df: DataFrame,
    url_col: str,
    blocklist,
    *,
    host_col: str = "host",
    flag_col: str = "blocked",
) -> DataFrame:
    """Annotate: ``df`` + [host, blocked (bigint 0/1)]. ``blocklist``:
    a Python list of domains (literal mode) or a 1-column DataFrame
    (table mode, column = the domain)."""
    with_host = df.withColumn(host_col, url_host(F.col(url_col)))
    sfx = host_suffixes(F.col(host_col))
    if isinstance(blocklist, DataFrame):
        # table mode: resolve on the DISTINCT-host side table (orders of
        # magnitude smaller than the corpus), then one host-keyed join
        # back — the corpus rows shuffle at most once, never explode
        dom_col = blocklist.columns[0]
        doms = blocklist.select(
            F.lower(F.col(dom_col)).alias("_dzm_dom")
        ).distinct()
        hosts = (
            with_host.select(F.col(host_col).alias("_dzm_h"))
            .where(F.col("_dzm_h") != "")
            .distinct()
        )
        blocked_hosts = (
            hosts.withColumn(
                "_dzm_sfx", F.explode(host_suffixes(F.col("_dzm_h")))
            )
            .join(doms, F.col("_dzm_sfx") == F.col("_dzm_dom"), "left_semi")
            .select("_dzm_h")
            .distinct()
        )
        return (
            with_host.join(
                blocked_hosts,
                with_host[host_col] == blocked_hosts["_dzm_h"],
                "left",
            )
            .withColumn(flag_col, F.col("_dzm_h").isNotNull().cast("long"))
            .drop("_dzm_h")
        )
    domains = sorted({d.lower() for d in blocklist})
    lit = F.array(*[F.lit(d) for d in domains])
    return with_host.withColumn(
        flag_col, F.arrays_overlap(sfx, lit).cast("long")
    )


def domain_filter(df: DataFrame, url_col: str, blocklist, **kw) -> DataFrame:
    """Keep rows whose host hits no blocklist domain (unparseable hosts
    pass — no domain evidence). Columns unchanged."""
    flagged = blocked_domains(df, url_col, blocklist, **kw)
    host_col = kw.get("host_col", "host")
    flag_col = kw.get("flag_col", "blocked")
    return flagged.where(F.col(flag_col) == 0).drop(host_col, flag_col)
