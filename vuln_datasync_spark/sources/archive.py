"""Archive source: read zip archives of JSON records as a DataFrame.

Reference analog: the OSV/CVE zip scans (S4/S9,
/root/reference/internal/fetchers/osv/fetcher.go:272-352,
/root/reference/internal/fetchers/cve/fetcher.go:163-250) — iterate zip
members, filter by path glob, JSON-decode each member, skip malformed
entries, guard against zip bombs.

Spark-native shape: ``binaryFile`` source (each zip = one row, scan
parallelism = #archives) -> ``mapInPandas`` extracting members per Arrow
batch -> ``from_json`` with an explicit schema on the JVM side (the Python
layer never parses JSON — it only slices bytes out of the archive).
"""

from __future__ import annotations

import fnmatch
import io
import zipfile
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

MAX_MEMBER_BYTES = 100 * 1024 * 1024  # zip-bomb guard (cve/fetcher.go:192-194)


def read_zip_json(
    spark: SparkSession,
    path: str,
    json_schema: T.StructType | str,
    member_glob: str = "*.json",
    max_member_bytes: int = MAX_MEMBER_BYTES,
) -> DataFrame:
    """Read `member_glob` entries from zip archives under `path` as typed
    rows. Malformed JSON lands in `_corrupt` (PERMISSIVE mode) instead of
    failing the scan (graceful-skip analog, osv/fetcher.go:534-541)."""
    bins = spark.read.format("binaryFile").load(path)

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            names, members, texts = [], [], []
            for src, content in zip(pdf["path"], pdf["content"]):
                with zipfile.ZipFile(io.BytesIO(content)) as zf:
                    for info in zf.infolist():
                        if info.is_dir():
                            continue
                        if not fnmatch.fnmatch(info.filename, member_glob):
                            continue  # filter-during-extract (S9)
                        if info.file_size > max_member_bytes:
                            continue  # bomb guard
                        # zip-slip guard: never trust member paths
                        if ".." in info.filename or info.filename.startswith("/"):
                            continue
                        names.append(src)
                        members.append(info.filename)
                        texts.append(zf.read(info).decode("utf-8", "replace"))
            yield pd.DataFrame(
                {"archive": names, "member": members, "raw": texts}
            )

    raw = bins.mapInPandas(
        extract, schema="archive string, member string, raw string"
    )
    if isinstance(json_schema, str):
        json_schema = T.StructType.fromDDL(json_schema)
    parsed_schema = T.StructType(
        json_schema.fields + [T.StructField("_corrupt", T.StringType(), True)]
    )
    parsed = raw.withColumn(
        "rec",
        F.from_json(
            "raw",
            parsed_schema,
            {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": "_corrupt"},
        ),
    )
    return parsed.select("archive", "member", "rec.*")


def filter_published(df: DataFrame, json_col: str, state_path: str = "$.cveMetadata.state") -> DataFrame:
    """Parse-time validity filter: keep only records whose JSON state field
    is PUBLISHED (/root/reference/internal/fetchers/cve/fetcher.go:354-365 —
    records in any other state are skipped before normalization).

    Accepts either the CVE envelope path ($.cveMetadata.state) or a direct
    $.state; checks the envelope path first, falling back to $.state.
    """
    state = F.coalesce(
        F.get_json_object(F.col(json_col), state_path),
        F.get_json_object(F.col(json_col), "$.state"),
    )
    return df.filter(state == "PUBLISHED")
