"""Local replica of the driver's correctness gate: run every queries() entry
on Spark and its oracle_sql() on DuckDB at the same sf, compare row count +
column names + order-insensitive values.

Usage: python tools/selfcheck.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
from pathlib import Path

import duckdb
import pandas as pd

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def duck_conn(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def normalize(pdf: pd.DataFrame) -> pd.DataFrame:
    pdf = pdf.reindex(sorted(pdf.columns), axis=1)
    for c in pdf.columns:
        if pdf[c].dtype == object:
            pdf[c] = pdf[c].astype(str)
        elif str(pdf[c].dtype).startswith(("float", "Float")):
            pdf[c] = pdf[c].astype("float64").round(6)
        elif str(pdf[c].dtype).startswith(("int", "Int", "uint", "UInt")):
            pdf[c] = pdf[c].astype("int64")
    return pdf.sort_values(by=list(pdf.columns)).reset_index(drop=True)


DUCK_TO_SPARK = {
    "INTEGER": "int", "BIGINT": "bigint", "DOUBLE": "double",
    "VARCHAR": "string", "FLOAT": "float", "HUGEINT": "hugeint",
}


def compare_schema(spark_df, duck_rel) -> list[str]:
    """Strict dtype comparison (the driver checks schemas, not just values)."""
    sdt = dict(spark_df.dtypes)
    ddt = {c: str(t) for c, t in zip(duck_rel.columns, duck_rel.types)}
    issues = []
    for c, t in sdt.items():
        d = ddt.get(c)
        if d is None:
            issues.append(f"schema: column {c} missing in oracle")
        elif t != DUCK_TO_SPARK.get(d, d.lower()):
            issues.append(f"schema: {c} spark={t} duckdb={d}")
    return issues


def compare(name: str, spark_df, oracle_pdf: pd.DataFrame) -> list[str]:
    issues = []
    got = normalize(spark_df.toPandas())
    want = normalize(oracle_pdf)
    if list(got.columns) != list(want.columns):
        issues.append(f"columns: spark={list(got.columns)} oracle={list(want.columns)}")
        return issues
    if len(got) != len(want):
        issues.append(f"rowcount: spark={len(got)} oracle={len(want)}")
    n = min(len(got), len(want))
    if n:
        neq = (got.iloc[:n].values != want.iloc[:n].values)
        import numpy as np

        bad = np.argwhere(neq)
        if len(bad):
            r, c = bad[0]
            col = got.columns[c]
            issues.append(
                f"values: {len(bad)} cells differ; first at row {r} col {col}: "
                f"spark={got.iloc[r, c]!r} oracle={want.iloc[r, c]!r}"
            )
    return issues


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod

    from commoncrawlnewsdataset_spark.session import get_spark

    spark = get_spark("selfcheck", master="local[8]", shuffle_partitions=8)
    con = duck_conn(sf_dir)
    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()

    failed = []
    for name, fn in queries.items():
        if only and name not in only:
            continue
        try:
            sdf = fn(spark, sf_dir)
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            failed.append(name)
            continue
        sql = oracles.get(name)
        if sql is None:
            # replicate the driver's rows-only path INCLUDING canonicalization
            # (round 1: array columns blew up the driver's pandas sort)
            try:
                pdf = normalize(sdf.toPandas())
                print(f"ok?  {name}: rows-only check, {len(pdf)} rows")
            except Exception as e:
                print(f"FAIL {name}: canonicalizer error: {e}")
                failed.append(name)
            continue
        try:
            rel = con.sql(sql)
            want = rel.df()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            failed.append(name)
            continue
        issues = compare_schema(sdf, rel) + compare(name, sdf, want)
        if issues:
            print(f"FAIL {name}: " + "; ".join(issues))
            failed.append(name)
        else:
            print(f"PASS {name} ({len(want)} rows)")
    print(f"\n{len(failed)} failed of {len(queries) if not only else len(only)}")
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
