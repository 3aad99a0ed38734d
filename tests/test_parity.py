"""Catalog ↔ DuckDB oracle parity at sf0.001 — in-suite mirror of the
driver's correctness gate (full run via tools/check_parity.py)."""

import duckdb
import pytest

from tools.check_parity import TABLES, canon
from vuln_datasync_spark.plans.queries import QUERIES

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    c = duckdb.connect()
    for t in TABLES:
        c.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return c


@pytest.mark.parametrize("qd", QUERIES, ids=[qd.name for qd in QUERIES])
def test_query_parity(spark, con, qd):
    sdf = qd.spark_fn(spark, SF_DIR)
    srows = [tuple(r) for r in sdf.collect()]
    if qd.sql is None:
        assert len(srows) >= 0  # rows-only contract: runs and returns
        return
    res = con.execute(qd.sql)
    dcols = [d[0] for d in res.description]
    drows = res.fetchall()
    sc, sv = canon(srows, sdf.columns)
    dc, dv = canon(drows, dcols)
    assert sc == dc, f"columns differ: {sc} vs {dc}"
    assert sv == dv, f"{len(sv)} vs {len(dv)} rows; first diffs: " + str(
        [(a, b) for a, b in zip(sv, dv) if a != b][:3]
    )
