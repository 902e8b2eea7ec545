"""URL canonicalization/dedup + corpus sentence-dedup operators.

Training-data-pipeline operators with no reference counterpart
(DeezyMatch is a matcher); semantics locked here, cross-engine parity
locked by the canonical_urls / url_dup_groups / sentence_dedup oracle
entries in __spark_entry__.py.
"""

import datetime

from pyspark.sql import functions as F

from deezymatch_spark.functions.urls import canonical_url
from deezymatch_spark.operators import (
    duplicated_sentences,
    sentence_dedup,
    url_dedup,
    url_dup_groups,
)


def _canon(spark, urls):
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    return [r.c for r in df.select(canonical_url("url").alias("c")).collect()]


def test_canonical_url_cases(spark):
    got = _canon(
        spark,
        [
            "HTTP://WWW.Example.COM:80/a/b/?b=2&a=1&utm_source=x#frag",
            "https://example.com:443/a",
            "https://example.com:8443/a",   # non-default port kept
            "http://example.com",            # empty path -> /
            "http://example.com/?",          # empty query dropped
            "http://example.com/x?gclid=1&fbclid=2&ref=z",
            "http://example.com/x?keep=1&ref",  # bare tracking key dropped
            "not a url #tail",               # malformed: trim+frag strip only
            "  http://A.B/  ",               # surrounding whitespace
            "http://example.com/p//",        # ALL trailing slashes stripped
            "http://www.www.example.com/",   # stacked www. stripped in one pass
            "http://example.com///",         # all-slash path -> root
        ],
    )
    assert got == [
        "http://example.com/a/b?a=1&b=2",
        "https://example.com/a",
        "https://example.com:8443/a",
        "http://example.com/",
        "http://example.com/",
        "http://example.com/x",
        "http://example.com/x?keep=1",
        "not a url ",
        "http://a.b/",
        "http://example.com/p",
        "http://example.com/",
        "http://example.com/",
    ]


def test_canonical_url_port_scheme_mismatch(spark):
    # :80 is only default for http — an https URL on :80 stays distinct
    got = _canon(spark, ["https://example.com:80/a", "http://example.com:443/a"])
    assert got == ["https://example.com:80/a", "http://example.com:443/a"]


def test_url_dup_groups_and_dedup(spark):
    ts = datetime.datetime(2024, 1, 1)
    rows = [
        (1, "http://www.site.com/p?utm_source=a", ts),
        (2, "HTTP://site.com:80/p", ts + datetime.timedelta(days=1)),
        (3, "https://site.com/p", ts),                     # scheme differs
        (4, "http://other.com/q", ts),
    ]
    df = spark.createDataFrame(rows, "id long, url string, ts timestamp")

    groups = url_dup_groups(df, "id", "url", "ts").collect()
    assert len(groups) == 1
    g = groups[0]
    assert g.canon_url == "http://site.com/p"
    assert g.n_dups == 2
    assert g.keep_id == 2  # latest ts wins

    kept = sorted(r.id for r in url_dedup(df, "id", "url", "ts").collect())
    assert kept == [2, 3, 4]

    # no ts column: max id wins
    kept2 = sorted(r.id for r in url_dedup(df, "id", "url").collect())
    assert kept2 == [2, 3, 4]


def test_url_dedup_null_and_blank_urls_survive(spark):
    """URL-less rows must NOT collapse into one survivor (that would be
    silent data loss on a corpus with partial URL coverage), and they
    are not URL-dup groups."""
    ts = datetime.datetime(2024, 1, 1)
    rows = [
        (1, None, ts),
        (2, None, ts),
        (3, "   ", ts),
        (4, "", ts),
        (5, "http://a.com/p", ts),
        (6, "HTTP://a.com:80/p", ts),
    ]
    df = spark.createDataFrame(rows, "id long, url string, ts timestamp")
    kept = sorted(r.id for r in url_dedup(df, "id", "url", "ts").collect())
    assert kept == [1, 2, 3, 4, 6]  # only the real URL dup collapses

    groups = url_dup_groups(df, "id", "url", "ts").collect()
    assert len(groups) == 1 and groups[0].canon_url == "http://a.com/p"


def test_sentence_dedup_boilerplate(spark):
    boiler = "Accept cookies to continue"
    rows = [
        (1, f"{boiler}. unique alpha text. tail one"),
        (2, f"{boiler}. unique beta text"),
        (3, f"{boiler}. {boiler}"),  # nothing survives
        (4, "standalone gamma text"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")

    dup = duplicated_sentences(df, "doc_id", "text").collect()
    assert [(r.sent, r.n_occurrences, r.n_docs) for r in dup] == [(boiler, 4, 3)]

    out = {r.doc_id: r for r in sentence_dedup(df, "doc_id", "text").collect()}
    assert out[1].clean_text == "unique alpha text. tail one"
    assert (out[1].n_kept, out[1].n_removed) == (2, 1)
    assert out[2].clean_text == "unique beta text"
    assert out[3].clean_text == "" and out[3].n_kept == 0 and out[3].n_removed == 2
    assert out[4].clean_text == "standalone gamma text"
    assert out[4].n_removed == 0
    # every input document survives as a row
    assert sorted(out) == [1, 2, 3, 4]


def test_sentence_dedup_hash_key_equals_text_key(spark):
    """hash_key=True keys the shuffle on a 128-bit hash but must yield
    identical outputs; the plan's aggregate must not carry the raw
    sentence string as its grouping key."""
    boiler = "Accept cookies to continue"
    rows = [
        (1, f"{boiler}. unique alpha text. tail one"),
        (2, f"{boiler}. unique beta text"),
        (3, f"{boiler}. {boiler}"),
        (4, "standalone gamma text"),
        (5, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    text_mode = sorted(
        sentence_dedup(df, "doc_id", "text").collect(), key=lambda r: r.doc_id
    )
    hash_mode = sorted(
        sentence_dedup(df, "doc_id", "text", hash_key=True).collect(),
        key=lambda r: r.doc_id,
    )
    assert [tuple(r) for r in text_mode] == [tuple(r) for r in hash_mode]

    dup = duplicated_sentences(df, "doc_id", "text", hash_key=True)
    assert dup.columns == ["sent_key", "n_occurrences", "n_docs"]
    plan = dup._jdf.queryExecution().executedPlan().toString()
    # the aggregate keys on the struct-of-longs, not the sentence text
    assert "sent_key" in plan
    assert [(r.n_occurrences, r.n_docs) for r in dup.collect()] == [(4, 3)]


def test_sentence_dedup_preserves_order(spark):
    # surviving sentences come back in original order even after the
    # anti-join shuffles them
    sents = [f"sentence number {i} body" for i in range(20)]
    rows = [(1, ". ".join(sents)), (2, "dup line. dup line")]
    # make "dup line" corpus-duplicated; doc 1's sentences are unique
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in sentence_dedup(df, "doc_id", "text").collect()}
    assert out[1].clean_text == ". ".join(sents)
    assert out[2].clean_text == ""


def test_canonical_url_idempotent(spark):
    """A canonicalizer must be a projection onto its own image:
    canonical(canonical(x)) == canonical(x). Property-checked over a
    structured URL grammar covering every rule interaction."""
    import itertools

    schemes = ["http", "HTTP", "https", "ftp"]
    hosts = ["www.Ex.COM", "ex.com:80", "www.ex.com:443", "ex.com:8080", "www.www.ex.com"]
    paths = ["", "/", "/A/b/", "/x", "/p//", "//"]
    queries = ["", "?", "?b=2&a=1", "?utm_source=x&a=1", "?ref&z=1&gclid=9"]
    frags = ["", "#f"]
    urls = [
        f"{s}://{h}{p}{q}{f}"
        for s, h, p, q, f in itertools.product(schemes, hosts, paths, queries, frags)
    ] + ["no scheme here", "", "   ", "weird://", "http://"]

    df = spark.createDataFrame([(u,) for u in urls], "url string")
    rows = df.select(
        "url",
        canonical_url("url").alias("c1"),
        canonical_url(canonical_url("url")).alias("c2"),
    ).collect()
    bad = [(r.url, r.c1, r.c2) for r in rows if r.c1 != r.c2]
    assert not bad, bad[:5]
