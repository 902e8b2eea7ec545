"""Domain-blocklist filtering and mutual-best assignment semantics."""

import random

from pyspark.sql import functions as F

from deezymatch_spark.operators.domains import (
    blocked_domains,
    domain_filter,
    host_suffixes,
    url_host,
)
from deezymatch_spark.operators.linkage import mutual_best_matches

URLS = [
    (1, "https://WWW.Spam.Example.COM:443/x?a=1"),   # subdomain of blocked
    (2, "http://example.com/okpath"),                # exactly blocked
    (3, "https://notexample.com/"),                  # suffix must respect labels
    (4, "https://www.good.org/a#f"),
    (5, "nonsense-without-scheme-or-host"),          # unparseable-ish
    (6, ""),
    (7, "https://a.b.tracker.net:8080/q"),           # deep subdomain
]
BLOCK = ["example.com", "tracker.net"]


def _df(spark):
    return spark.createDataFrame(URLS, "id long, url string")


def test_url_host_and_suffixes(spark):
    got = {
        r.id: r.h
        for r in _df(spark).select("id", url_host("url").alias("h")).collect()
    }
    assert got[1] == "spam.example.com"
    assert got[2] == "example.com"
    assert got[4] == "good.org"
    assert got[6] == ""
    sfx = (
        spark.createDataFrame([("a.b.c",)], "h string")
        .select(host_suffixes("h").alias("s"))
        .collect()[0]
        .s
    )
    assert sfx == ["a.b.c", "b.c", "c"]


def test_blocked_domains_literal_and_table_agree(spark):
    lit = {
        r.id: r.blocked
        for r in blocked_domains(_df(spark), "url", BLOCK).collect()
    }
    # label-boundary matching: notexample.com must NOT be blocked
    assert lit == {1: 1, 2: 1, 3: 0, 4: 0, 5: 0, 6: 0, 7: 1}
    bl_df = spark.createDataFrame([(d,) for d in BLOCK], "domain string")
    tab = {
        r.id: r.blocked
        for r in blocked_domains(_df(spark), "url", bl_df).collect()
    }
    assert tab == lit
    kept = {r.id for r in domain_filter(_df(spark), "url", BLOCK).collect()}
    assert kept == {3, 4, 5, 6}
    assert domain_filter(_df(spark), "url", BLOCK).columns == ["id", "url"]


def _naive_mutual(pairs, directed):
    import collections
    best = {}
    sym = {}
    for a, b, s in pairs:
        if a == b:
            continue
        if not directed:
            a, b = min(a, b), max(a, b)
        k = (a, b)
        sym[k] = max(sym.get(k, float("-inf")), s)
    adj = collections.defaultdict(dict)
    for (a, b), s in sym.items():
        adj[("L", a) if directed else a][b] = max(
            adj[("L", a) if directed else a].get(b, float("-inf")), s
        )
        adj[("R", b) if directed else b][a] = max(
            adj[("R", b) if directed else b].get(a, float("-inf")), s
        )
    for k, nb in adj.items():
        mx = max(nb.values())
        best[k] = min(p for p, s in nb.items() if s == mx)
    out = set()
    for (a, b), s in sym.items():
        ka = ("L", a) if directed else a
        kb = ("R", b) if directed else b
        if best[ka] == b and best[kb] == a:
            out.add((a, b, s))
    return out


def test_mutual_best_matches_naive_parity(spark):
    rng = random.Random(42)
    pairs = [
        (rng.randint(0, 15), rng.randint(0, 15), rng.randint(0, 9) * 1000)
        for _ in range(120)
    ]
    df = spark.createDataFrame(pairs, "id1 long, id2 long, w long")
    for directed in (False, True):
        got = {
            (r.id1, r.id2, r.w)
            for r in mutual_best_matches(df, "w", directed=directed).collect()
        }
        assert got == _naive_mutual(pairs, directed)


def test_mutual_best_is_an_assignment(spark):
    rng = random.Random(7)
    pairs = [
        (rng.randint(0, 30), rng.randint(0, 30), rng.randint(0, 50))
        for _ in range(300)
    ]
    df = spark.createDataFrame(pairs, "id1 long, id2 long, w long")
    got = mutual_best_matches(df, "w").collect()
    seen = [x for r in got for x in (r.id1, r.id2)]
    assert len(seen) == len(set(seen))  # each node in at most one pair
    assert all(r.id1 < r.id2 for r in got)
