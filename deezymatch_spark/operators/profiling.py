"""Column profiling — the Deequ/Great-Expectations-style intake report
a 100 TB pipeline runs BEFORE ER or curation: per-column row/null/
distinct counts and the top-k heavy hitters, so schema drift, null
floods, and enum-column cardinality explosions surface before they
poison blocking keys or quality gates. No reference counterpart
(DeezyMatch assumes clean TSV input; SURVEY.md §2.9).

Spark shape: ONE pass stacks the requested columns into
(column, value) rows via an exploded array-of-structs projection
(shuffle-free, null-safe — a MapType stack would drop null values),
then
- stats: one two-phase aggregation per the stacked frame
  (count / nulls / exact count-distinct — the distinct is the
  expensive one: a (column, value)-keyed exchange; at corpus scale
  swap in ``approx_count_distinct`` via ``exact_distinct=False``);
- heavy hitters: map-combined groupBy(column, value) then a rank-k
  window per column — ``WindowGroupLimit`` pushes the top-k below the
  final exchange, so each map task emits at most k rows per column.
Both consume the same stacked projection; the corpus is scanned once
per report, never once per column.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

__all__ = ["profile_columns", "top_values"]


def _stacked(df: DataFrame, cols: list[str]) -> DataFrame:
    return df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("column"),
                        F.col(c).cast("string").alias("value"),
                    )
                    for c in cols
                ]
            )
        ).alias("s")
    ).select("s.column", "s.value")


def profile_columns(
    df: DataFrame,
    cols: list[str] | None = None,
    *,
    exact_distinct: bool = True,
) -> DataFrame:
    """→ DataFrame[column, n_rows, n_nulls, n_distinct] (n_distinct
    excludes NULL, counts distinct string renderings)."""
    cols = cols or df.columns
    distinct = (
        F.count_distinct(F.col("value"))
        if exact_distinct
        else F.approx_count_distinct(F.col("value"))
    )
    return (
        _stacked(df, cols)
        .groupBy("column")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.col("value").isNull().cast("long")).alias("n_nulls"),
            distinct.cast("long").alias("n_distinct"),
        )
    )


def top_values(df: DataFrame, cols: list[str] | None = None, *, k: int = 3) -> DataFrame:
    """→ DataFrame[column, value, n, rank] — the k most frequent
    non-null values per column, ties broken by value ascending
    (deterministic)."""
    cols = cols or df.columns
    counts = (
        _stacked(df, cols)
        .where(F.col("value").isNotNull())
        .groupBy("column", "value")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.partitionBy("column").orderBy(
        F.col("n").desc(), F.col("value").asc()
    )
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= int(k))
        .select("column", "value", "n", F.col("rank").cast("long").alias("rank"))
    )
