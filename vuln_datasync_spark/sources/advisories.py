"""YAML advisory source — the GitLab advisory-tree ingest path (S7/S8/S9).

Reference behavior re-expressed Spark-first:

  * tree walk over a cloned advisory repo, picking ``*.yml`` files
    (/root/reference/internal/fetchers/gitlab/fetcher.go:89-136) —
    here a ``text`` scan with ``recursiveFileLookup`` + ``pathGlobFilter``
    (scan parallelism = #files, no driver-side walking);
  * YAML parse + required-field validation: records missing identifier or
    title are SKIPPED, not errors
    (/root/reference/internal/fetchers/gitlab/fetcher.go:261-288);
  * scalar-or-array coercion for flexible fields — a YAML field that may
    be a single string or a list always becomes array<string>
    (FlexibleStringArray, /root/reference/internal/types/types.go:248-271);
  * package slug fallback from the file path (segment after the package
    manager dir) and ecosystem from the path
    (/root/reference/internal/fetchers/gitlab/fetcher.go:290-324).

The YAML decode itself runs in ``mapInPandas`` over Arrow batches — the
one place Python is unavoidable (it IS the parser, the analog of the
reference's yaml.Unmarshal worker pool); everything downstream is columnar.
Executor memory is bounded by the Arrow batch size, not the tree size, and
the parse fans out with the scan partitions — no shuffle anywhere.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

ADVISORY_DDL = (
    "identifier string, title string, description string, "
    "package_slug string, ecosystem string, fixed_versions array<string>, "
    "identifiers array<string>, urls array<string>, cvss string, "
    "published_date string, modified_date string, path string"
)

# package-manager path segments recognized by the reference's
# extractEcosystem / extractPackageFromPath (gitlab/fetcher.go:290-324)
_PATH_ECOSYSTEM = {
    "gems": "rubygems",
    "npm": "npm",
    "pypi": "pypi",
    "go": "go",
    "maven": "maven",
    "nuget": "nuget",
}


def _flex_array(v) -> list[str]:
    """FlexibleStringArray coercion (types.go:248-271): scalar -> [str],
    sequence -> [str, ...], anything else -> []."""
    if v is None:
        return []
    if isinstance(v, (list, tuple)):
        return [str(x) for x in v]
    if isinstance(v, (str, int, float, bool)):
        return [str(v)]
    return []


def _ecosystem_from_path(path: str) -> str:
    for seg, eco in _PATH_ECOSYSTEM.items():
        if f"/{seg}/" in path:
            return eco
    return "unknown"


def _slug_from_path(path: str) -> str:
    parts = path.split("/")
    for i, part in enumerate(parts):
        if part in _PATH_ECOSYSTEM and i + 1 < len(parts):
            return parts[i + 1]
    return ""


def parse_yaml_advisories(
    df: DataFrame, yaml_col: str = "yaml", path_col: str = "path"
) -> DataFrame:
    """Parse raw YAML advisory documents into typed rows.

    Skip semantics mirror the reference exactly (fetcher.go:261-288):
    unparseable YAML, non-mapping documents, and records missing
    identifier or title are dropped silently (the reference logs + returns
    nil); a missing package_slug falls back to the path segment after the
    package-manager dir.
    """
    import yaml as _yaml  # deferred: executors import on first batch

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = [f.split(" ")[0] for f in ADVISORY_DDL.split(", ")]
        for pdf in batches:
            out: dict[str, list] = {c: [] for c in cols}
            for raw, path in zip(pdf[yaml_col], pdf[path_col]):
                try:
                    rec = _yaml.safe_load(raw)
                except _yaml.YAMLError:
                    continue
                if not isinstance(rec, dict):
                    continue
                ident = str(rec.get("identifier") or "")
                title = str(rec.get("title") or "")
                if not ident or not title:
                    continue  # skip invalid (required-field validation)
                slug = str(rec.get("package_slug") or "")
                if not slug:
                    slug = _slug_from_path(path or "")
                out["identifier"].append(ident)
                out["title"].append(title)
                out["description"].append(
                    None
                    if rec.get("description") is None
                    else str(rec.get("description"))
                )
                out["package_slug"].append(slug)
                out["ecosystem"].append(_ecosystem_from_path(path or ""))
                out["fixed_versions"].append(_flex_array(rec.get("fixed_versions")))
                out["identifiers"].append(_flex_array(rec.get("identifiers")))
                out["urls"].append(_flex_array(rec.get("urls")))
                out["cvss"].append(
                    None if rec.get("cvss") is None else str(rec.get("cvss"))
                )
                out["published_date"].append(
                    None
                    if rec.get("published_date") is None
                    else str(rec.get("published_date"))
                )
                out["modified_date"].append(
                    None
                    if rec.get("modified_date") is None
                    else str(rec.get("modified_date"))
                )
                out["path"].append(path)
            # explicit object dtype: an all-skipped batch would otherwise
            # produce float64 columns Arrow cannot cast to array<string>
            yield pd.DataFrame(
                {c: pd.Series(v, dtype=object) for c, v in out.items()}
            )

    return df.mapInPandas(op, schema=ADVISORY_DDL)


def read_advisory_tree(spark: SparkSession, root: str, glob: str = "*.yml") -> DataFrame:
    """S7: scan an advisory repo tree (the git-clone stand-in) as one row
    per YAML file. Listing and reading parallelize with the file count —
    the Spark analog of the reference's 10-worker tree walk
    (gitlab/fetcher.go:89-136)."""
    return (
        spark.read.format("text")
        .option("wholetext", "true")
        .option("recursiveFileLookup", "true")
        .option("pathGlobFilter", glob)
        .load(root)
        .select(
            F.col("value").alias("yaml"),
            F.input_file_name().alias("path"),
        )
    )


def read_advisories(spark: SparkSession, root: str) -> DataFrame:
    """Tree scan + YAML parse in one call (the full GitLab source)."""
    return parse_yaml_advisories(read_advisory_tree(spark, root))
