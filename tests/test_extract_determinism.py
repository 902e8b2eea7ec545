"""North-rule per-row invariant: byte-identical extracted/normalized
text per url — across runs AND across partitioning/parallelism."""

from pyspark.sql import functions as F

from deezymatch_spark.functions import normalize_udf
from deezymatch_spark.sources.pages import extract_title, generate_pages


def _extract(spark, num_partitions):
    pages = generate_pages(spark, 400, num_partitions=num_partitions)
    rows = (
        pages.select(
            "url",
            extract_title(F.col("html")).alias("title"),
            normalize_udf(extract_title(F.col("html"))).alias("title_norm"),
        )
        .collect()
    )
    return {r.url: (r.title.encode("utf-8"), r.title_norm.encode("utf-8")) for r in rows}


def test_extraction_byte_identical_across_runs_and_partitionings(spark):
    a = _extract(spark, num_partitions=1)
    b = _extract(spark, num_partitions=7)
    c = _extract(spark, num_partitions=7)
    assert a == b == c
    assert len(a) == 400
    # html bytes themselves are deterministic per url too
    h1 = {r.url: bytes(r.html) for r in generate_pages(spark, 100).collect()}
    h2 = {r.url: bytes(r.html) for r in generate_pages(spark, 100, num_partitions=3).collect()}
    assert h1 == h2
