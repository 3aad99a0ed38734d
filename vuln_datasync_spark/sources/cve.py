"""CVE 5.x normalization projection (P8/S10).

Spark restatement of the reference's CVE normalizer
(/root/reference/internal/merger/normalizer.go:189-310): explicit-schema
nested ``from_json``, English-description preference, CVSS v3.1 base-score
extraction, affected/fixed version split by status, deterministic VULN id,
millisecond timestamp parsing. All higher-order column expressions — no
Python in the path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.hashing import vuln_id
from ..functions.normalize import summary_truncate
from ..functions.timestamps import parse_cve_millis

CVE_DDL = (
    "cveMetadata struct<cveId: string, state: string, datePublished: string, "
    "dateUpdated: string>, "
    "containers struct<cna: struct<"
    "descriptions: array<struct<lang: string, value: string>>, "
    "metrics: array<struct<cvssV3_1: struct<baseScore: double>>>, "
    "affected: array<struct<vendor: string, product: string, "
    "versions: array<struct<version: string, status: string, "
    "lessThan: string>>>>>>"
)


def normalize_cve_records(df: DataFrame, json_col: str) -> DataFrame:
    """One CVE 5.x JSON record per row -> canonical projection.

    * required: cveId non-empty (cve/fetcher.go:354-357)
    * details: first English description, else the first one, else null
      (normalizer.go:224-256 extractCVEDescriptions); summary via
      first-sentence truncation
    * severity: first metric carrying cvssV3_1.baseScore, %.1f formatted
      (normalizer.go:258-270)
    * package_name: LAST affected entry with vendor+product (the
      reference's loop overwrites each iteration, normalizer.go:273-283)
    * affected_versions: status == 'affected'; fixed_versions: status ==
      'unaffected' plus a second append for entries with lessThan set —
      including the reference's double-append of unaffected+lessThan rows
      (normalizer.go:286-300). Group order differs from Go's interleaved
      appends; compare as sets.
    """
    rec = F.from_json(F.col(json_col), T.StructType.fromDDL(CVE_DDL))
    cna = rec["containers"]["cna"]
    cve_id = rec["cveMetadata"]["cveId"]

    descs = cna["descriptions"]
    en = F.filter(descs, lambda d: d["lang"] == "en")
    details = F.coalesce(
        F.try_element_at(en, F.lit(1))["value"], F.try_element_at(descs, F.lit(1))["value"]
    )

    with_score = F.filter(
        cna["metrics"], lambda m: m["cvssV3_1"]["baseScore"].isNotNull()
    )
    severity = F.when(
        F.size(with_score) > 0,
        F.format_string(
            "%.1f", F.try_element_at(with_score, F.lit(1))["cvssV3_1"]["baseScore"]
        ),
    )

    valid_aff = F.filter(
        cna["affected"],
        lambda a: a["vendor"].isNotNull()
        & (a["vendor"] != "")
        & a["product"].isNotNull()
        & (a["product"] != ""),
    )
    last = F.try_element_at(valid_aff, F.lit(-1))
    package_name = F.when(
        F.size(valid_aff) > 0,
        F.concat(last["vendor"], F.lit("/"), last["product"]),
    )
    vers = F.flatten(F.transform(valid_aff, lambda a: a["versions"]))
    affected_versions = F.transform(
        F.filter(vers, lambda v: v["status"] == "affected"),
        lambda v: v["version"],
    )
    fixed_versions = F.concat(
        F.transform(
            F.filter(vers, lambda v: v["status"] == "unaffected"),
            lambda v: v["version"],
        ),
        F.transform(
            F.filter(
                vers,
                lambda v: v["lessThan"].isNotNull() & (v["lessThan"] != ""),
            ),
            lambda v: v["version"],
        ),
    )

    out = df.select(
        vuln_id(cve_id).alias("vuln_id"),
        F.array(cve_id).alias("aliases"),
        details.alias("details"),
        summary_truncate(details).alias("summary"),
        severity.alias("severity"),
        package_name.alias("package_name"),
        F.coalesce(affected_versions, F.array().cast("array<string>")).alias(
            "affected_versions"
        ),
        F.coalesce(fixed_versions, F.array().cast("array<string>")).alias(
            "fixed_versions"
        ),
        parse_cve_millis(rec["cveMetadata"]["datePublished"]).alias(
            "published_at"
        ),
        parse_cve_millis(rec["cveMetadata"]["dateUpdated"]).alias(
            "modified_at"
        ),
        cve_id.alias("cve_id"),
    )
    return out.filter(F.col("cve_id").isNotNull() & (F.col("cve_id") != ""))
