"""Timestamp-parsing column functions (SURVEY.md §2 F2-F4).

The reference parses three string timestamp shapes, silently dropping
values that fail to parse (the `if err == nil` idiom):

  * RFC3339 `2024-01-02T03:04:05Z` / `+01:00` — OSV published/modified
    (/root/reference/internal/merger/normalizer.go:67-78)
  * date-only `2024-01-02` — GitLab published/modified dates
    (/root/reference/internal/merger/normalizer.go:146-155)
  * millisecond UTC `2024-01-02T03:04:05.000Z` — CVE metadata
    (/root/reference/internal/merger/normalizer.go:245-256)

Spark restatement: ``try_to_timestamp`` (null on parse failure = the
reference's skip-on-error), pure JVM expressions.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

RFC3339_FMT = "yyyy-MM-dd'T'HH:mm:ssXXX"
DATE_ONLY_FMT = "yyyy-MM-dd"
CVE_MILLIS_FMT = "yyyy-MM-dd'T'HH:mm:ss.SSS'Z'"


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def parse_rfc3339(col: Column | str) -> Column:
    """F2: RFC3339 with zone offset or Z; null when unparseable."""
    return F.try_to_timestamp(_c(col), F.lit(RFC3339_FMT))


def parse_date_only(col: Column | str) -> Column:
    """F3: bare date -> midnight timestamp; null when unparseable."""
    return F.try_to_timestamp(_c(col), F.lit(DATE_ONLY_FMT))


def parse_cve_millis(col: Column | str) -> Column:
    """F4: CVE-style millisecond UTC timestamp; null when unparseable."""
    return F.try_to_timestamp(_c(col), F.lit(CVE_MILLIS_FMT))
