"""Survivorship: build the golden record for each entity cluster.

The last stage of every production ER pipeline (reference scope ends at
`candidateRanker.py` — clustering candidates; what a *user* of linkage
does next is merge each cluster into one canonical record).  Given the
per-record cluster assignment that `connected_components` /
`incremental_er` produce, ``golden_records`` emits ONE row per cluster
whose attribute values are chosen by per-column survivorship rules —
the "most frequent value wins / longest value wins / best record wins"
policies of the MDM literature (e.g. Talburt, *Entity Resolution and
Information Quality*, ch. 6).

Scale shape
-----------
One ``groupBy(cluster)`` — a single map-combined Exchange over the
record table; every rule compiles to a built-in JVM aggregate
(``mode`` / ``max_by`` / ``min`` / ``max`` / ``sum``), so there is no
Python, no join, no window, and no second shuffle.  ``mode`` keeps a
per-group value→count map in the aggregation buffer: bounded by the
attribute's per-cluster distinct cardinality (lang/source/country-type
attributes — the columns survivorship is *for*), not by cluster size.

Determinism (the property that makes the output hash-gradable and
retry-safe): every rule is a total order —

- ``mode``     most frequent value, ties → LOWEST value
               (Spark's ``mode(col, deterministic=true)``);
- ``longest``  longest string, ties → lexicographically GREATEST
               (``max_by`` over a ``struct(length, value)`` key);
- ``argmax``   value from the row maximizing an explicit order tuple —
               the caller appends a unique column (the record id) as
               the final tie-break, making the order total;
- ``min`` / ``max`` / ``sum``  the plain aggregates.

NULL values never win a rule (built-in aggregates skip them) unless
the whole cluster is NULL for that column.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame, functions as F

__all__ = ["golden_records", "assign_clusters"]

_SIMPLE = {"min": F.min, "max": F.max, "sum": F.sum}


def assign_clusters(
    records: DataFrame,
    clusters: DataFrame,
    *,
    id_col: str = "doc_id",
    node_col: str = "node",
    component_col: str = "component",
    cluster_col: str = "cluster_id",
) -> DataFrame:
    """Attach ``connected_components`` output to the record table.

    Records absent from ``clusters`` (singletons — CC only sees nodes
    with at least one edge) become their own cluster: ``cluster_id =
    coalesce(component, id)``.  One equi-join on the record id; the
    cluster table is |matched nodes| rows — orders of magnitude smaller
    than the corpus for near-dup-density data, so AQE broadcasts it.
    """
    comp = clusters.select(
        F.col(node_col).alias("_gr_node"),
        F.col(component_col).alias("_gr_component"),
    )
    return records.join(
        comp, records[id_col] == comp["_gr_node"], "left"
    ).select(
        records["*"],
        F.coalesce("_gr_component", records[id_col]).alias(cluster_col),
    )


def golden_records(
    records: DataFrame,
    rules: dict[str, tuple],
    *,
    cluster_col: str = "cluster_id",
) -> DataFrame:
    """One row per cluster: ``[cluster_col, n_members, *rules.keys()]``.

    ``rules`` maps each output column to a rule tuple:

    - ``("mode", col)``               most frequent, ties → lowest
    - ``("longest", col)``            longest string, ties → greatest
    - ``("min"|"max"|"sum", col)``    plain aggregate
    - ``("argmax", value, *order)``   ``value`` from the row with the
      greatest ``struct(*order)``; pass the record id last to break
      ties deterministically.

    ``col`` / ``value`` / ``order`` entries may be column names or
    Column expressions.  The whole frame is ONE map-combined
    aggregation (see module docstring).
    """
    if not rules:
        raise ValueError("golden_records: at least one rule required")

    def _c(x) -> Column:
        return F.col(x) if isinstance(x, str) else x

    aggs = [F.count(F.lit(1)).cast("long").alias("n_members")]
    for out, rule in rules.items():
        kind = rule[0]
        if kind == "mode":
            aggs.append(F.mode(_c(rule[1]), True).alias(out))
        elif kind == "longest":
            c = _c(rule[1])
            aggs.append(F.max_by(c, F.struct(F.length(c), c)).alias(out))
        elif kind in _SIMPLE:
            aggs.append(_SIMPLE[kind](_c(rule[1])).alias(out))
        elif kind == "argmax":
            if len(rule) < 3:
                raise ValueError(
                    f"golden_records: argmax rule for {out!r} needs at "
                    "least one order column: ('argmax', value, *order)"
                )
            order: Sequence = rule[2:]
            aggs.append(
                F.max_by(
                    _c(rule[1]), F.struct(*[_c(o) for o in order])
                ).alias(out)
            )
        else:
            raise ValueError(
                f"golden_records: unknown rule {kind!r} for {out!r} "
                "(expected mode|longest|min|max|sum|argmax)"
            )
    return records.groupBy(cluster_col).agg(*aggs)
