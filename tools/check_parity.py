"""Local mimic of the driver's correctness gate: run each catalog query in
Spark AND its oracle SQL in DuckDB on the same parquet tables; compare
row count, column names, and values (order-insensitive, exact match after
string normalization). Usage: python tools/check_parity.py [sf_dir] [names...]
"""

from __future__ import annotations

import math
import sys

sys.path.insert(0, ".")

import duckdb

from vuln_datasync_spark.plans.queries import QUERIES
from vuln_datasync_spark.session import get_spark

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings".split()
)


def norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(round(v, 9) + 0.0)
    if isinstance(v, bool):
        return str(v).lower()
    return str(v)


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = sorted(
        tuple(norm_cell(r[i]) for i in order) for r in rows
    )
    return [cols[i] for i in order], out


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    spark = get_spark("parity", master="local[4]", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    n_pass = n_fail = n_rowsonly = 0
    for qd in QUERIES:
        if only and qd.name not in only:
            continue
        try:
            sdf = qd.spark_fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as e:
            print(f"FAIL  {qd.name}: spark error: {e}")
            n_fail += 1
            continue
        if qd.sql is None:
            print(f"rows  {qd.name}: {len(srows)} rows (no oracle)")
            n_rowsonly += 1
            continue
        try:
            res = con.execute(qd.sql)
            dcols = [d[0] for d in res.description]
            drows = res.fetchall()
        except Exception as e:
            print(f"FAIL  {qd.name}: duckdb error: {e}")
            n_fail += 1
            continue
        sc, sv = canon(srows, scols)
        dc, dv = canon(drows, dcols)
        if sc != dc:
            print(f"FAIL  {qd.name}: columns differ spark={sc} duck={dc}")
            n_fail += 1
        elif len(sv) != len(dv):
            print(f"FAIL  {qd.name}: row count {len(sv)} vs {len(dv)}")
            n_fail += 1
        elif sv != dv:
            diffs = [(a, b) for a, b in zip(sv, dv) if a != b][:3]
            print(f"FAIL  {qd.name}: values differ, e.g. {diffs}")
            n_fail += 1
        else:
            print(f"ok    {qd.name}: {len(sv)} rows")
            n_pass += 1
    print(f"\n{n_pass} ok, {n_fail} fail, {n_rowsonly} rows-only")
    spark.stop()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
