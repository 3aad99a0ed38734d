"""Changelog sources — batch and streaming readers for the change-event log.

The reference pulls from three HTTP/git/GCS sources (S1-S10); the engine's
ingress is a changelog directory (parquet or JSON) standing in for an
Iceberg/Kafka changelog. Schema is always explicit (no inference at scale);
files written before a column existed read back as null (parquet clipping =
free column-add on the read side).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

CHANGELOG_DDL = (
    "commit_seq long, op string, repo string, path string, commit string, "
    "lang string, content string, ts timestamp, size_bytes long"
)


def changelog_schema() -> T.StructType:
    return T.StructType.fromDDL(CHANGELOG_DDL)


def read_changelog_batch(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    since_seq: int | None = None,
) -> DataFrame:
    """Batch read, optionally incremental from a sequence watermark
    (reference analog: `updated_at >= $1`,
    /root/reference/sql/vulnerabilities.sql:128-132)."""
    reader = spark.read.schema(changelog_schema())
    df = reader.parquet(path) if fmt == "parquet" else reader.json(path)
    if since_seq is not None:
        from pyspark.sql import functions as F

        df = df.filter(F.col("commit_seq") > since_seq)
    return df


def read_changelog_stream(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    max_files_per_trigger: int | None = None,
) -> DataFrame:
    """Streaming tail with rate control (reference analog: fixed-size batch
    callback, /root/reference/internal/fetchers/osv/fetcher.go:729-778)."""
    reader = spark.readStream.schema(changelog_schema())
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(path) if fmt == "parquet" else reader.json(path)


def read_changelog_with_fallback(
    spark: SparkSession,
    paths: list[str],
    fmt: str = "parquet",
    since_seq: int | None = None,
) -> DataFrame:
    """S3 fallback chooser: try sources in priority order, degrade
    gracefully to the next when one is absent/unreadable (reference:
    GCS -> HTTP fallback, /root/reference/internal/fetchers/osv/
    fetcher.go:115-133). The first source that both exists and yields a
    readable frame wins; exhausting the list raises the LAST error, like
    the reference's final download failure."""
    last_err: Exception | None = None
    for p in paths:
        try:
            df = read_changelog_batch(spark, p, fmt=fmt, since_seq=since_seq)
            df.schema  # force source resolution (cheap; no data scan)
            # a source that resolves but lists no files is "absent"
            if not df.inputFiles():
                raise FileNotFoundError(f"no files under {p}")
            return df
        except Exception as e:  # noqa: BLE001 - mirror reference degrade
            last_err = e
            continue
    raise last_err if last_err else FileNotFoundError("no sources given")
