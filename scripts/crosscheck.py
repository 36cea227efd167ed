"""Local mimic of the driver's correctness gate: run every queries() entry on
Spark and its oracle_sql() on DuckDB over the same sf dir; compare row count,
column names, and order-insensitive values. Usage:

    python scripts/crosscheck.py [sf_dir]
"""

from __future__ import annotations

import math
import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.9g}"
    return str(v)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    from __spark_entry__ import oracle_sql, queries
    from rle_array_spark.engine import session

    spark = session(app="crosscheck", cores=8, shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    qs, oracles = queries(), oracle_sql()
    failures = 0
    for name, fn in qs.items():
        sdf = fn(spark, sf_dir)
        srows = sdf.collect()
        scols = sorted(sdf.columns)
        if name not in oracles:
            print(f"{name:30s} rows-only: {len(srows)} rows (no oracle)")
            continue
        odf = con.execute(oracles[name]).fetch_df()
        ocols = sorted(odf.columns)
        status = []
        if scols != ocols:
            status.append(f"SCHEMA {scols} != {ocols}")
        if len(srows) != len(odf):
            status.append(f"ROWS {len(srows)} != {len(odf)}")
        if not status:
            sset = sorted(tuple(norm(r[c]) for c in scols) for r in srows)
            oset = sorted(
                tuple(norm(v) for v in row)
                for row in odf[scols].itertuples(index=False, name=None)
            )
            if sset != oset:
                n_bad = sum(1 for a, b in zip(sset, oset) if a != b)
                status.append(f"VALUES {n_bad} differing tuples")
                for a, b in list(zip(sset, oset))[:200]:
                    if a != b:
                        status.append(f"  spark={a} oracle={b}")
                        break
        if status:
            failures += 1
            print(f"{name:30s} FAIL: {'; '.join(status[:3])}")
        else:
            print(f"{name:30s} OK ({len(srows)} rows)")
    spark.stop()
    print(f"\n{failures} failures / {len(qs)} queries")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
