"""Local mimic of the driver's correctness gate: run each catalog query in
Spark AND its oracle SQL in DuckDB on the same parquet tables; compare
row count, column names, and values two ways:

1. string-normalized exact compare (order-insensitive) — value truth;
2. a replica of the driver's pandas canonicalization — both results as
   pandas DataFrames, columns sorted by name, ``sort_values`` over all
   columns, then a DTYPE-SENSITIVE ``hash_pandas_object``. This layer is
   what the driver actually grades: it throws on list-typed cells
   (unhashable in sort_values) and hash-mismatches int64-vs-float64 even
   when values are equal (e.g. DuckDB HUGEINT window sums -> float64).
   Round 4 shipped red driver rows that layer 1 alone called green.

Usage: python tools/check_parity.py [sf_dir] [names...]
"""

from __future__ import annotations

import math
import sys

sys.path.insert(0, ".")

import duckdb
import pandas as pd

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


def driver_hash(pdf: pd.DataFrame):
    """Replicate the driver's canonicalization: sort columns by name,
    sort_values over all columns, dtype-sensitive row hash. Raises the
    same TypeError the driver does on list-typed cells; int64 vs float64
    of equal values hash DIFFERENTLY (that is the point)."""
    cols = sorted(pdf.columns)
    c = pdf[cols].sort_values(cols).reset_index(drop=True)
    # pandas units differ between engines for equal instants (Spark ns vs
    # DuckDB us); the driver evidently tolerates this (timestamp entries
    # are driver-green), so normalize datetimes to us before hashing.
    for col in cols:
        if str(c[col].dtype).startswith("datetime64"):
            c[col] = c[col].astype("datetime64[us]")
    return int(pd.util.hash_pandas_object(c, index=False).sum())


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
            sdf = qd.spark_fn(spark, sf_dir).persist()
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
            spdf = sdf.toPandas()
            sdf.unpersist()
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
            dpdf = con.execute(qd.sql).df()
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
            # layer 2: the driver's dtype-sensitive pandas canonicalization
            try:
                sh, dh = driver_hash(spdf), driver_hash(dpdf)
            except Exception as e:
                print(
                    f"FAIL  {qd.name}: values ok but driver-canon raises: "
                    f"{type(e).__name__}: {e}"
                )
                n_fail += 1
                continue
            if sh != dh:
                dt = {
                    c: (str(spdf[c].dtype), str(dpdf[c].dtype))
                    for c in spdf.columns
                    if c in dpdf.columns
                    and str(spdf[c].dtype) != str(dpdf[c].dtype)
                }
                print(
                    f"FAIL  {qd.name}: values ok but driver-hash differs; "
                    f"dtype deltas spark-vs-duck: {dt}"
                )
                n_fail += 1
            else:
                print(f"ok    {qd.name}: {len(sv)} rows")
                n_pass += 1
    print(f"\n{n_pass} ok, {n_fail} fail, {n_rowsonly} rows-only")
    spark.stop()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
