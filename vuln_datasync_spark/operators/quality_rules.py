"""Data-contract validation: declarative row/set-level constraint checks
with an exact violation report.

The ingest path already quarantines malformed events (streaming DLQ,
``functions/normalize.py reject_events``); this is the complementary
AUDIT surface — the "data contract" a table's consumers pin: columns
that must never be null, enum domains, value ranges, identifier formats,
key uniqueness, referential integrity against a dimension. The report is
a tiny frame (one row per rule) so it can be logged per ingest run,
alerted on, or asserted in CI; every count is exact, so the whole report
is value-checkable against a SQL oracle.

Plan shape: all ROW-level rules (not_null / in_set / range / regex)
compile into ONE aggregate over a single scan — adding a rule adds a
conditional-sum expression, not a pass. ``unique`` adds one
count-distinct aggregate per rule, ``ref`` one broadcast-able anti-join
per rule; nothing anywhere is ∝ rule_count × data.

Violation semantics (documented, engine-portable):

* ``not_null``  — rows where the column IS NULL.
* ``in_set``    — non-null rows whose value is outside ``values``
                  (nulls are not_null's business).
* ``range``     — non-null rows outside [lo, hi] (either bound may be
                  omitted for a one-sided check).
* ``regex``     — non-null rows NOT fully matching ``pattern`` (use the
                  Java/RE2 common subset for engine portability).
* ``unique``    — surplus copies: count(col rows) - count(distinct col)
                  over non-null values.
* ``ref``       — non-null values with no match in the reference frame's
                  ``ref_col`` (referential orphans).

Reference analog: the reference validates advisory records field-by-field
before upsert (internal/validator/validator.go); here the contract is
declarative, batched, and produces an auditable report instead of
per-record drops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_ROW_KINDS = {"not_null", "in_set", "range", "regex"}
_REPORT_COLS = ["rule", "kind", "col", "violations", "checked"]


def _row_violation(rule: dict):
    col = F.col(rule["col"])
    kind = rule["kind"]
    if kind == "not_null":
        return col.isNull()
    if kind == "in_set":
        return col.isNotNull() & ~col.isin(list(rule["values"]))
    if kind == "range":
        lo, hi = rule.get("lo"), rule.get("hi")
        if lo is None and hi is None:
            raise ValueError(f"range rule needs lo and/or hi: {rule}")
        cond = F.lit(False)
        if lo is not None:
            cond = cond | (col < F.lit(lo))
        if hi is not None:
            cond = cond | (col > F.lit(hi))
        return col.isNotNull() & cond
    if kind == "regex":
        return col.isNotNull() & ~col.rlike(
            "^(?:" + rule["pattern"] + ")$"
        )
    raise ValueError(f"unknown row rule kind: {kind}")


def validate_rules(df: DataFrame, rules: list[dict]) -> DataFrame:
    """Evaluate ``rules`` against ``df`` and return the report frame
    ``(rule, kind, col, violations, checked)`` in rule order. Each rule
    is a dict with ``name``, ``kind``, ``col`` and kind-specific fields
    (see module docstring); ``ref`` rules carry the reference DataFrame
    under ``ref`` and its column under ``ref_col``."""
    if not rules:
        raise ValueError("no rules given")
    names = [r.get("name") or f'{r["kind"]}:{r.get("col", "")}' for r in rules]
    if len(set(names)) != len(names):
        raise ValueError(f"duplicate rule names: {names}")

    spark = df.sparkSession
    reports: list[DataFrame] = []

    row_rules = [
        (n, r) for n, r in zip(names, rules) if r["kind"] in _ROW_KINDS
    ]
    if row_rules:
        aggs = [F.count(F.lit(1)).cast("long").alias("_checked")]
        for name, r in row_rules:
            aggs.append(
                F.sum(
                    F.when(_row_violation(r), F.lit(1)).otherwise(F.lit(0))
                )
                .cast("long")
                .alias(f"_v_{len(aggs)}")
            )
        one = df.agg(*aggs)
        stack = F.array(
            *[
                F.struct(
                    F.lit(name).alias("rule"),
                    F.lit(r["kind"]).alias("kind"),
                    F.lit(r["col"]).alias("col"),
                    F.col(f"_v_{i + 1}").alias("violations"),
                    F.col("_checked").alias("checked"),
                )
                for i, (name, r) in enumerate(row_rules)
            ]
        )
        reports.append(
            one.select(F.explode(stack).alias("r")).select("r.*")
        )

    for name, r in zip(names, rules):
        if r["kind"] == "unique":
            col = F.col(r["col"])
            reports.append(
                df.filter(col.isNotNull()).agg(
                    (F.count(col) - F.count_distinct(col))
                    .cast("long")
                    .alias("violations"),
                    F.count(col).cast("long").alias("checked"),
                ).select(
                    F.lit(name).alias("rule"),
                    F.lit("unique").alias("kind"),
                    F.lit(r["col"]).alias("col"),
                    "violations",
                    "checked",
                )
            )
        elif r["kind"] == "ref":
            ref: DataFrame = r["ref"]
            probe = df.filter(F.col(r["col"]).isNotNull()).select(r["col"])
            orphans = probe.join(
                ref.select(F.col(r["ref_col"]).alias(r["col"])).distinct(),
                r["col"],
                "left_anti",
            )
            reports.append(
                orphans.agg(
                    F.count(F.lit(1)).cast("long").alias("violations")
                )
                .crossJoin(
                    probe.agg(
                        F.count(F.lit(1)).cast("long").alias("checked")
                    )
                )
                .select(
                    F.lit(name).alias("rule"),
                    F.lit("ref").alias("kind"),
                    F.lit(r["col"]).alias("col"),
                    "violations",
                    "checked",
                )
            )
        elif r["kind"] not in _ROW_KINDS:
            raise ValueError(f"unknown rule kind: {r['kind']}")

    out = reports[0]
    for rep in reports[1:]:
        out = out.unionByName(rep)
    order = {n: i for i, n in enumerate(names)}
    mapping = F.create_map(
        *[x for n in names for x in (F.lit(n), F.lit(order[n]))]
    )
    return out.withColumn("_o", mapping[F.col("rule")]).orderBy("_o").drop(
        "_o"
    )


def assert_rules(df: DataFrame, rules: list[dict]) -> None:
    """Raise ``ValueError`` listing every violated rule (CI / pre-merge
    gate form of :func:`validate_rules`)."""
    bad = [
        (r["rule"], r["violations"])
        for r in validate_rules(df, rules).collect()
        if r["violations"] > 0
    ]
    if bad:
        raise ValueError(
            "data-contract violations: "
            + ", ".join(f"{n}={v}" for n, v in bad)
        )
