"""YAML advisory source (S7/S8): tree scan, parse, validation-skip,
FlexibleStringArray coercion, slug/ecosystem from path — mirrors
/root/reference/internal/fetchers/gitlab/fetcher.go:261-324 and
internal/types/types.go:248-271 semantics."""

import os

from vuln_datasync_spark.plans.queries import ensure_shipped
from vuln_datasync_spark.sources.advisories import (
    parse_yaml_advisories,
    read_advisories,
    read_advisory_tree,
)

VALID = """\
identifier: GHSA-1111
title: Prototype pollution
description: 'a: bad thing'
package_slug: npm/left-pad
fixed_versions: ['1.0.0', '2.0.0']
identifiers: [GHSA-1111, CVE-2024-1]
urls: https://example.test/advisory
cvss: 'CVSS:3.1/AV:N'
published_date: '2024-01-02'
"""

SCALAR_FLEX = """\
identifier: GHSA-2222
title: Scalar coercion
fixed_versions: 1.2.3
"""

MISSING_TITLE = """\
identifier: GHSA-3333
description: no title -> skipped
"""

NO_SLUG = """\
identifier: GHSA-4444
title: Slug from path
"""

BAD_YAML = "identifier: [unclosed\n  - :::"


def _write_tree(root):
    files = {
        "gems/rails/GHSA-1111.yml": VALID,
        "npm/lodash/GHSA-2222.yml": SCALAR_FLEX,
        "npm/lodash/GHSA-3333.yml": MISSING_TITLE,
        "pypi/requests/GHSA-4444.yml": NO_SLUG,
        "go/mod/broken.yml": BAD_YAML,
        "npm/lodash/README.md": "not yaml, not matched by glob",
    }
    for rel, content in files.items():
        p = os.path.join(root, rel)
        os.makedirs(os.path.dirname(p), exist_ok=True)
        with open(p, "w") as f:
            f.write(content)


def test_tree_scan_glob_and_parallel_shape(spark, tmp_path):
    ensure_shipped(spark)
    _write_tree(str(tmp_path))
    raw = read_advisory_tree(spark, str(tmp_path))
    # .md excluded by glob; 5 .yml files, one row each, full text
    assert raw.count() == 5
    assert set(raw.columns) == {"yaml", "path"}


def test_parse_validation_and_coercion(spark, tmp_path):
    ensure_shipped(spark)
    _write_tree(str(tmp_path))
    rows = {r["identifier"]: r for r in read_advisories(spark, str(tmp_path)).collect()}
    # missing-title and unparseable records are skipped, not errors
    assert set(rows) == {"GHSA-1111", "GHSA-2222", "GHSA-4444"}

    v = rows["GHSA-1111"]
    assert v["package_slug"] == "npm/left-pad"
    assert v["ecosystem"] == "rubygems"  # from the /gems/ path segment
    assert v["fixed_versions"] == ["1.0.0", "2.0.0"]
    assert v["identifiers"] == ["GHSA-1111", "CVE-2024-1"]
    # FlexibleStringArray: scalar urls -> single-element array
    assert v["urls"] == ["https://example.test/advisory"]
    assert v["description"] == "a: bad thing"

    s = rows["GHSA-2222"]
    # FlexibleStringArray: scalar fixed_versions -> [str(scalar)]
    assert s["fixed_versions"] == ["1.2.3"]
    assert s["ecosystem"] == "npm"

    n = rows["GHSA-4444"]
    # package_slug falls back to the path segment after the manager dir
    assert n["package_slug"] == "requests"
    assert n["ecosystem"] == "pypi"


def test_parse_from_column_no_files(spark):
    """parse_yaml_advisories is a pure operator: works on any (yaml, path)
    frame, no filesystem involved."""
    ensure_shipped(spark)
    df = spark.createDataFrame(
        [("identifier: X-1\ntitle: t", "a/npm/p/x.yml"), ("junk: {", "b.yml")],
        "yaml string, path string",
    )
    out = parse_yaml_advisories(df).collect()
    assert len(out) == 1
    assert out[0]["identifier"] == "X-1"
    assert out[0]["package_slug"] == "p"
