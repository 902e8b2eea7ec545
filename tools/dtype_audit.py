"""Pandas-fetch dtype audit for every oracle: the driver-fidelity gate.

``tools/selfcheck.py`` compares values through DuckDB's ``fetchall()``,
which yields native Python ints — that masked the r3
``classification_metrics`` failure for three rounds: DuckDB ``sum(int)``
returns HUGEINT (int128), and a driver that fetches through pandas
(``fetchdf``) coerces HUGEINT to float64/object, so ``123.0`` hashes
against Spark's bigint ``123`` and diverges even though ``fetchall``
agrees. This audit walks EVERY ``oracle_sql()`` entry through the
pandas path and flags any output column whose fetched dtype falls
outside the known-green families, cross-checked against the Spark
query's declared schema. Only the schema is READ, but building some
queries executes real Spark jobs (IVF/SemDeDup centroid collects, CC
iterations, the full ER pipeline), so run this at a small SF —
sf0.001/sf0.01 — not against big data:

- oracle column fetches as float64/object while Spark declares an
  integral type  → the HUGEINT / Decimal / NULL-int coercion trap
- either side emits a boolean column → cross-engine bool normalization
  through pandas is unproven at the driver; emit bigint 0/1 instead
- Spark declares float/double while the oracle fetches int → hash
  formats diverge ("1" vs "1.0")

Usage: python tools/dtype_audit.py [SF_DIR]
Exit 1 if any oracle column lands outside the green families.
"""

from __future__ import annotations

import os
import sys

import duckdb
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]

# pandas dtype kind → family.  'i'/'u' int, 'f' float, 'b' bool,
# 'O' object (strings, lists, Decimals, overflowed HUGEINTs), 'M' ts.
_KIND_FAMILY = {"i": "int", "u": "int", "f": "float", "b": "bool",
                "O": "object", "M": "timestamp"}

# Spark simpleString prefix → family
_SPARK_FAMILY = [
    ("tinyint", "int"), ("smallint", "int"), ("int", "int"),
    ("bigint", "int"), ("long", "int"),
    ("float", "float"), ("double", "float"), ("decimal", "float"),
    ("boolean", "bool"), ("string", "object"), ("array", "object"),
    ("timestamp", "timestamp"), ("date", "timestamp"),
    ("binary", "object"),
]


def spark_family(dt: str) -> str:
    for prefix, fam in _SPARK_FAMILY:
        if dt.startswith(prefix):
            return fam
    return dt


def main() -> None:
    sf = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[4]")
        .config("spark.sql.shuffle.partitions", "4")
        .config("spark.ui.enabled", "false")
        .appName("dtype-audit")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf}/{t}.parquet"
        if os.path.exists(p):
            con.sql(f"create view {t} as select * from '{p}'")

    import __spark_entry__ as E

    qs = E.queries()
    oracles = E.oracle_sql()
    bad = 0
    for name, sql in oracles.items():
        if name not in qs:
            print(f"WARN  {name}: oracle without a queries() entry")
            continue
        try:
            sschema = {f.name: f.dataType.simpleString()
                       for f in qs[name](spark, sf).schema.fields}
        except Exception as ex:  # pragma: no cover - diagnosed by selfcheck
            print(f"FAIL  {name}: spark analysis error: {str(ex)[:200]}")
            bad += 1
            continue
        try:
            pdf = con.sql(sql).fetchdf()
        except Exception as ex:  # pragma: no cover - diagnosed by selfcheck
            print(f"FAIL  {name}: duckdb error: {str(ex)[:200]}")
            bad += 1
            continue
        issues = []
        for col in pdf.columns:
            dfam = _KIND_FAMILY.get(pdf[col].dtype.kind, pdf[col].dtype.kind)
            sfam = spark_family(sschema.get(col, "<missing>"))
            if col not in sschema:
                issues.append(f"{col}: oracle-only column")
            elif dfam == "bool" or sfam == "bool":
                issues.append(f"{col}: boolean reaches the driver "
                              f"(spark {sfam}, pandas {dfam})")
            elif sfam == "int" and dfam != "int":
                # empty frames legitimately fetch as object; ignore
                if len(pdf):
                    # an object column of Python ints still hashes as
                    # ints through str(); only flag non-int payloads
                    if dfam == "object" and all(
                        isinstance(v, (int, np.integer))
                        for v in pdf[col].head(100)
                    ):
                        continue
                    issues.append(f"{col}: spark int vs pandas {dfam} "
                                  "(HUGEINT/Decimal coercion trap)")
            elif sfam == "float" and dfam == "int":
                issues.append(f"{col}: spark float vs pandas int "
                              "(format divergence)")
        if issues:
            print(f"FLAG  {name}: " + "; ".join(issues))
            bad += 1
        else:
            print(f"ok    {name}")
    print(f"\n{len(oracles) - bad} clean, {bad} flagged")
    spark.stop()
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
