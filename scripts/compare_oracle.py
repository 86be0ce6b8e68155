"""Local stand-in for the driver's correctness gate: run every
``queries()`` entry on Spark and its ``oracle_sql()`` on DuckDB at the
same sf, compare row count, column names, and order-insensitive values.

Usage: python scripts/compare_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import duckdb
import pandas as pd

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
    return df.sort_values(by=list(df.columns), ignore_index=True)


def strict_cells(df: pd.DataFrame) -> list[tuple[str, ...]]:
    """Driver-like value view: stringify every cell WITHOUT coercing
    oracle dtypes onto Spark dtypes, columns sorted by name, rows
    sorted. Catches cross-engine typing drift (e.g. DuckDB HUGEINT
    surfacing as float64 "345.0" vs Spark bigint "345" — the q82 r3
    driver red) that the coerced comparison above hides.
    """
    import decimal

    import numpy as np

    def cell(v):
        if isinstance(v, (bool, np.bool_)):
            return str(bool(v))
        if isinstance(v, (int, np.integer)):
            return str(int(v))
        if isinstance(v, (float, np.floating, decimal.Decimal)):
            return repr(float(v))  # Decimal('0.120000') == float 0.12
        return str(v)

    cols = sorted(df.columns)
    rows = []
    for tup in df[cols].itertuples(index=False, name=None):
        rows.append(tuple(cell(v) for v in tup))
    return sorted(rows)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as e
    from spark_relieffc_fselection_spark import get_spark

    spark = get_spark(shuffle_partitions=16)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs, oracles = e.queries(), e.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        sdf = fn(spark, sf_dir).toPandas()
        t_spark = time.time() - t0
        if name not in oracles:
            print(f"{name}: rows={len(sdf)} (no oracle, rows-only) [{t_spark:.1f}s]")
            continue
        t0 = time.time()
        odf = con.sql(oracles[name]).df()
        t_duck = time.time() - t0
        status = []
        if len(sdf) != len(odf):
            status.append(f"ROWS {len(sdf)} vs {len(odf)}")
        if sorted(sdf.columns) != sorted(odf.columns):
            status.append(f"COLS {sorted(sdf.columns)} vs {sorted(odf.columns)}")
        if not status:
            a, b = normalize(sdf), normalize(odf.astype(sdf.dtypes.to_dict(), errors="ignore"))
            try:
                b = b.astype(a.dtypes.to_dict())
                if not a.equals(b):
                    neq = (a != b) & ~(a.isna() & b.isna())
                    ndiff = int(neq.any(axis=1).sum())
                    status.append(f"VALUES {ndiff}/{len(a)} rows differ")
                    ex = a[neq.any(axis=1)].head(3)
                    ey = b[neq.any(axis=1)].head(3)
                    status.append(f"\n  spark:\n{ex}\n  duck:\n{ey}")
            except Exception as ex:  # dtype coercion failure == schema drift
                status.append(f"DTYPE {ex}")
            if not status and strict_cells(sdf) != strict_cells(odf):
                sa, sb = strict_cells(sdf), strict_cells(odf)
                diff = next((i, x, y) for i, (x, y) in enumerate(zip(sa, sb)) if x != y)
                status.append(f"STRICT-HASH (typing drift) first diff row {diff}")
        if status:
            failures.append(name)
            print(f"{name}: FAIL {' '.join(status)}")
        else:
            print(f"{name}: OK rows={len(sdf)} [spark {t_spark:.1f}s, duck {t_duck:.1f}s]")
    spark.stop()
    print(f"\n{len(failures)} failures" + (f": {failures}" if failures else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
