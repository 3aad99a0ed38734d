"""OSV-source normalization projection (P6/S10).

Spark restatement of the reference's OSV normalizer
(/root/reference/internal/merger/normalizer.go:28-78 NormalizeOSV +
/root/reference/internal/fetchers/osv/fetcher.go:539-541 required-field
check): explicit-schema ``from_json`` (never inference at scale), summary
fallback to first-sentence truncation of details, alias sanitation, RFC3339
timestamp parsing with null-on-failure. Pure column expressions — the whole
projection stays inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.hashing import sanitize_aliases
from ..functions.normalize import summary_truncate
from ..functions.timestamps import parse_rfc3339

OSV_DDL = (
    "id string, summary string, details string, aliases array<string>, "
    "published string, modified string"
)


def normalize_osv_records(df: DataFrame, json_col: str) -> DataFrame:
    """One OSV JSON record per row -> canonical vulnerability projection.

    * required field: id (rows without it are dropped — fetcher.go:539-541)
    * summary: record's own if non-empty, else first-sentence truncation
      of details (normalizer.go:339-356)
    * aliases: VULN-format ids filtered out (merger.go:108-121)
    * published/modified: RFC3339, null when unparseable
      (normalizer.go:67-78)
    """
    rec = F.from_json(F.col(json_col), T.StructType.fromDDL(OSV_DDL))
    out = df.select(
        rec["id"].alias("vuln_id"),
        F.coalesce(
            F.nullif(rec["summary"], F.lit("")),
            summary_truncate(rec["details"]),
        ).alias("summary"),
        sanitize_aliases(
            F.coalesce(rec["aliases"], F.array().cast("array<string>"))
        ).alias("aliases"),
        parse_rfc3339(rec["published"]).alias("published_at"),
        parse_rfc3339(rec["modified"]).alias("modified_at"),
    )
    return out.filter(
        F.col("vuln_id").isNotNull() & (F.col("vuln_id") != "")
    )
