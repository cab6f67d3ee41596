"""Local replica of the driver's correctness gate: run every queries()
entry on Spark and its oracle_sql() on DuckDB at sf0.01; compare row count,
schema (column names), and order-insensitive values (column-name-sorted,
rounded floats). Usage: python tools/check_oracles.py [sf_dir] [names...]"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

from crawler_to_md_spark.queries import ORACLES, QUERIES  # noqa: E402
from crawler_to_md_spark.session import get_spark  # noqa: E402

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm_cell(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        return f"{v:.9g}"
    if hasattr(v, "isoformat"):
        return v.isoformat()
    return repr(v)


def norm_rows(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(norm_cell(r[i]) for i in order) for r in rows]
    return sorted(cols), sorted(out)


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    names = sys.argv[2:] or list(QUERIES)
    spark = get_spark("oracle-check")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    failures = []
    for name in names:
        fn = QUERIES[name]
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            spdf = sdf.toPandas()
            srows = [tuple(r) for r in spdf.itertuples(index=False, name=None)]
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL {name}: spark error {type(e).__name__}: {e}")
            continue
        if name not in ORACLES:
            print(f"ok   {name}: rows-only ({len(srows)} rows)")
            continue
        try:
            rel = con.sql(ORACLES[name])
            dpdf = rel.df()
            dcols = list(dpdf.columns)
            drows = [tuple(r) for r in dpdf.itertuples(index=False, name=None)]
        except Exception as e:  # noqa: BLE001
            failures.append(name)
            print(f"FAIL {name}: duckdb error {e}")
            continue
        # Typed comparison: the driver's value hash is dtype-sensitive
        # (DuckDB HUGEINT vs Spark BIGINT mismatched 4 queries in r1).
        def _kind(dt):
            # Width-insensitive: the driver's hash tolerates int32 vs int64
            # (r1 evidence) but not int vs float (HUGEINT -> float64 in
            # pandas) or int vs object.
            k = dt.kind
            return {"i": "int", "u": "int", "f": "float", "b": "bool",
                    "M": "ts", "O": "obj"}.get(k, k)

        sdt = {c: _kind(spdf[c].dtype) for c in scols}
        ddt = {c: _kind(dpdf[c].dtype) for c in dcols}
        if sorted(scols) == sorted(dcols) and sdt != ddt:
            bad = {c: (sdt[c], ddt[c]) for c in sdt if sdt[c] != ddt.get(c)}
            failures.append(name)
            print(f"FAIL {name}: dtype mismatch (spark, duckdb): {bad}")
            continue
        sc, sr = norm_rows(scols, srows)
        dc, dr = norm_rows(dcols, drows)
        if sc != dc:
            failures.append(name)
            print(f"FAIL {name}: schema {sc} vs {dc}")
        elif len(sr) != len(dr):
            failures.append(name)
            print(f"FAIL {name}: rowcount {len(sr)} vs {len(dr)}")
            print("  spark-only:", [r for r in sr if r not in set(dr)][:3])
            print("  duck-only: ", [r for r in dr if r not in set(sr)][:3])
        elif sr != dr:
            failures.append(name)
            diff = [(a, b) for a, b in zip(sr, dr) if a != b][:3]
            print(f"FAIL {name}: value mismatch, first diffs: {diff}")
        else:
            print(f"ok   {name}: {len(sr)} rows match")
    print(f"\n{len(names) - len(failures)}/{len(names)} ok")
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
