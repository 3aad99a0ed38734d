"""Data-contract validator: per-kind violation semantics, one-pass plan
for row rules, gate form."""

import pytest
from pyspark.sql import functions as F

from vuln_datasync_spark.operators.quality_rules import (
    assert_rules,
    validate_rules,
)


def _frame(spark):
    return spark.createDataFrame(
        [
            (1, "a@x.io", "click", 10.0, 100),
            (2, "bad-email", "click", -5.0, 100),
            (3, None, "view", 2000.0, 200),
            (4, "c@y.io", "error", 50.0, 999),
            (4, "d@z.io", "click", 60.0, None),
        ],
        "id long, email string, etype string, val double, fk long",
    )


def _report(spark, df, rules):
    return {r["rule"]: (r["violations"], r["checked"])
            for r in validate_rules(df, rules).collect()}


def test_each_kind_counts_exactly(spark):
    df = _frame(spark)
    ref = spark.createDataFrame([(100,), (200,)], "k long")
    rules = [
        {"name": "email_nn", "kind": "not_null", "col": "email"},
        {"name": "etype_dom", "kind": "in_set", "col": "etype",
         "values": ["click", "view"]},
        {"name": "val_rng", "kind": "range", "col": "val", "lo": 0,
         "hi": 1000},
        {"name": "email_fmt", "kind": "regex", "col": "email",
         "pattern": r"[a-z]+@[a-z]+\.[a-z]+"},
        {"name": "id_uniq", "kind": "unique", "col": "id"},
        {"name": "fk_ref", "kind": "ref", "col": "fk", "ref": ref,
         "ref_col": "k"},
    ]
    rep = _report(spark, df, rules)
    assert rep["email_nn"] == (1, 5)
    assert rep["etype_dom"] == (1, 5)       # 'error'; null etype never occurs
    assert rep["val_rng"] == (2, 5)         # -5 and 2000
    assert rep["email_fmt"] == (1, 5)       # 'bad-email'; null email passes
    assert rep["id_uniq"] == (1, 5)         # id 4 twice -> one surplus copy
    assert rep["fk_ref"] == (1, 4)          # 999 orphan; null fk not checked


def test_one_sided_range_and_validation_errors(spark):
    df = _frame(spark)
    rep = _report(
        spark, df, [{"name": "lo_only", "kind": "range", "col": "val",
                     "lo": 0}]
    )
    assert rep["lo_only"] == (1, 5)
    with pytest.raises(ValueError):
        validate_rules(df, [])
    with pytest.raises(ValueError):
        validate_rules(df, [{"name": "r", "kind": "range", "col": "val"}])
    with pytest.raises(ValueError):
        validate_rules(df, [
            {"name": "x", "kind": "not_null", "col": "id"},
            {"name": "x", "kind": "not_null", "col": "fk"},
        ])
    with pytest.raises(ValueError):
        validate_rules(df, [{"name": "r", "kind": "bogus", "col": "val"}])


def test_row_rules_compile_to_single_scan(spark):
    """All row-level rules share ONE aggregate over one scan: the plan
    contains exactly one parquet/LocalTableScan relation read."""
    df = _frame(spark)
    rep = validate_rules(df, [
        {"name": "a", "kind": "not_null", "col": "email"},
        {"name": "b", "kind": "in_set", "col": "etype", "values": ["click"]},
        {"name": "c", "kind": "range", "col": "val", "lo": 0},
        {"name": "d", "kind": "regex", "col": "email", "pattern": ".*"},
    ])
    plan = rep._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("LocalRelation") + plan.count("Relation") <= 1 or (
        plan.lower().count("scan") <= 1
    ), plan


def test_assert_rules_gate(spark):
    df = _frame(spark)
    assert_rules(df, [{"name": "id_nn", "kind": "not_null", "col": "id"}])
    with pytest.raises(ValueError, match="email_nn=1"):
        assert_rules(
            df, [{"name": "email_nn", "kind": "not_null", "col": "email"}]
        )


def test_cli_validate_strict(spark, tmp_path, capsys, monkeypatch):
    import json

    from vuln_datasync_spark import cli
    from vuln_datasync_spark.sinks.manifest_table import ManifestTable

    monkeypatch.setattr(cli, "_spark", lambda args: spark)
    tbl = str(tmp_path / "t")
    table = ManifestTable.create(spark, tbl, n_buckets=2, key_cols=("id",))
    table.merge(
        spark.createDataFrame(
            [(1, 1, "c1", "insert", "x"), (2, 2, "c2", "insert", None)],
            "id long, commit_seq long, commit string, op string, "
            "payload string",
        ),
        "dq", 0,
    )
    rules = tmp_path / "rules.json"
    rules.write_text(json.dumps(
        [{"name": "payload_nn", "kind": "not_null", "col": "payload"}]
    ))
    assert cli.main(["validate", "--table", tbl, "--rules", str(rules)]) == 0
    out = [json.loads(l) for l in capsys.readouterr().out.splitlines()]
    assert out[0]["violations"] == 1 and out[0]["checked"] == 2
    assert cli.main(
        ["validate", "--table", tbl, "--rules", str(rules), "--strict"]
    ) == 1
