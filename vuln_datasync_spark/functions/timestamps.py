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

# Go's time.Parse(time.RFC3339, ...) accepts an OPTIONAL fractional-second
# field even though the layout omits it — real OSV records carry values
# like 2023-11-08T04:13:20.445843Z. Spark's lenient try_to_timestamp parses
# those (fraction + offset conversion) but also over-accepts shapes Go
# rejects (bare dates, space separators), so gate it on the RFC3339 shape.
_RFC3339_RE = (
    r"^\d{4}-\d{2}-\d{2}T\d{2}:\d{2}:\d{2}(\.\d{1,9})?(Z|[+-]\d{2}:\d{2})$"
)


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def parse_rfc3339(col: Column | str) -> Column:
    """F2: RFC3339 with optional fractional seconds and Z/offset zone;
    null when unparseable (the reference's if-err-skip)."""
    c = _c(col)
    return F.when(c.rlike(_RFC3339_RE), F.try_to_timestamp(c))


def parse_date_only(col: Column | str) -> Column:
    """F3: bare date -> midnight timestamp; null when unparseable."""
    return F.try_to_timestamp(_c(col), F.lit(DATE_ONLY_FMT))


def parse_cve_millis(col: Column | str) -> Column:
    """F4: CVE-style millisecond UTC timestamp; null when unparseable."""
    return F.try_to_timestamp(_c(col), F.lit(CVE_MILLIS_FMT))
