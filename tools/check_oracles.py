"""Local mirror of the driver's CORRECTNESS gate: run each
``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB over
the same sf parquet tables; compare row count, column names, and
order-insensitive values.

Usage: python tools/check_oracles.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys

import duckdb
import pandas as pd

sys.path.insert(0, ".")

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    # Strict non-scalar probe: reject array/map/struct column VALUES
    # outright. The driver's canonicalizer chokes on them (round 3's
    # bpe_tokens incident), but a raw sort alone only reproduces that
    # for multi-column frames (multi-key sort hashes -> TypeError on
    # lists; a single-key sort comparison-sorts lists just fine), so
    # probe explicitly — stricter than the driver, the safe direction.
    for c in df.columns:
        if df[c].dtype == object:
            vals = df[c].dropna()
            if len(vals) and isinstance(
                vals.iloc[0], (list, dict, set, tuple)
            ) or (len(vals) and hasattr(vals.iloc[0], "__array__")):
                raise TypeError(
                    f"non-scalar values in column {c!r} "
                    f"({type(vals.iloc[0]).__name__}): the driver "
                    "canonicalizer cannot sort/hash these"
                )
    # Driver-mirror: sort on the RAW column values (no str-cast
    # masking before the sort).
    df = df.sort_values(by=list(df.columns), ignore_index=True)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        elif str(df[c].dtype).startswith("float"):
            # exact bit compare: the queries are designed so Spark and
            # DuckDB compute IDENTICAL doubles (integer ratios,
            # left-fold-ordered sums); re-rounding here would mask
            # engine rounding divergence the driver would catch
            df[c] = df[c].astype("float64")
        elif str(df[c].dtype).startswith(("int", "uint", "Int")):
            df[c] = df[c].astype("int64")
        elif str(df[c].dtype) == "bool":
            df[c] = df[c].astype(bool)
    return df.sort_values(by=list(df.columns), ignore_index=True)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as entrymod
    from solrizer_spark.session import get_spark

    spark = get_spark(app_name="oracle-check", cpus=8, shuffle_partitions=16)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs, oracles = entrymod.queries(), entrymod.oracle_sql()
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        spark_pdf = fn(spark, sf_dir).toPandas()
        if name not in oracles:
            # rows-only queries still pass through the driver's
            # canonicalizer — run it so unsortable columns fail locally
            try:
                canon(spark_pdf)
            except Exception as exc:  # noqa: BLE001 - mirror driver err row
                failures += 1
                print(f"FAIL {name:24s} rows-only canon crash: {exc!r}")
                continue
            print(f"OK  {name:24s} rows={len(spark_pdf)} (rows-only check, no oracle)")
            continue
        duck_pdf = con.execute(oracles[name]).fetchdf()
        a, b = canon(spark_pdf), canon(duck_pdf)
        ok_cols = list(a.columns) == list(b.columns)
        ok_rows = len(a) == len(b)
        ok_vals = ok_cols and ok_rows and a.equals(b)
        status = "OK " if (ok_cols and ok_rows and ok_vals) else "FAIL"
        print(f"{status} {name:24s} rows spark={len(a)} duck={len(b)} cols={'=' if ok_cols else 'DIFF'} vals={'=' if ok_vals else 'DIFF'}")
        if not ok_vals:
            failures += 1
            if not ok_cols:
                print("  spark cols:", list(a.columns))
                print("  duck  cols:", list(b.columns))
            elif ok_rows:
                neq = (a != b) & ~(a.isna() & b.isna())
                bad = neq.any(axis=1)
                print(a[bad].head(3))
                print(b[bad].head(3))
    spark.stop()
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
