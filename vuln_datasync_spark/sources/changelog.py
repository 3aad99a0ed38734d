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
