"""End-to-end advisory ingest pipeline: normalize → alias merge (transitive)
→ unchanged-skip → bucketed MERGE. Mirrors the reference's sync loop
(internal/jobs/server.go:115-170, 864-907) at the pipeline level."""

import json

from vuln_datasync_spark.pipelines import create_vuln_table, ingest_advisories
from vuln_datasync_spark.sources.osv import normalize_osv_records

GL_SCHEMA = (
    "vuln_id string, aliases array<string>, summary string, "
    "details string, modified_at timestamp"
)


def _osv_frame(spark, records):
    return normalize_osv_records(
        spark.createDataFrame([(json.dumps(r),) for r in records],
                              "raw string"),
        "raw",
    )


def test_ingest_merge_skip_and_exactly_once(spark, tmp_path):
    table = create_vuln_table(spark, str(tmp_path / "vulns"), n_buckets=4)

    osv = _osv_frame(spark, [
        {"id": "OSV-1", "summary": "osv summary one",
         "details": "long details one", "aliases": ["CVE-100"],
         "modified": "2026-01-02T00:00:00Z"},
        {"id": "OSV-2", "summary": "osv summary two",
         "details": "", "aliases": ["CVE-200"],
         "modified": "2026-01-02T00:00:00Z"},
    ])
    lin1 = ingest_advisories(table, {"osv": osv}, run_seq=1)
    assert lin1["rows_applied"] == 2
    rows = {r["vuln_id"]: r for r in table.read().collect()}
    assert set(rows) == {"OSV-1", "OSV-2"}
    assert rows["OSV-1"]["sources"] == ["osv"]
    assert rows["OSV-1"]["summary"] == "osv summary one"

    # run 2: a gitlab advisory overlapping OSV-1 via CVE-100; its extra
    # alias + details must fold in, id and osv-priority fields must stay
    gl = spark.createDataFrame(
        [("G-1", ["CVE-100", "GHSA-9"], "", "gitlab details",
          None)],
        GL_SCHEMA,
    )
    lin2 = ingest_advisories(table, {"gitlab": gl}, run_seq=2)
    assert lin2["rows_applied"] == 1  # OSV-2 untouched (hash skip)
    rows = {r["vuln_id"]: r for r in table.read().collect()}
    assert set(rows) == {"OSV-1", "OSV-2"}
    m = rows["OSV-1"]
    assert m["sources"] == ["gitlab", "osv"]
    assert "GHSA-9" in m["aliases"] and "CVE-100" in m["aliases"]
    assert m["summary"] == "osv summary one"  # osv outranks gitlab
    # the OSV projection carries no details column (it only feeds the
    # summary fallback, as in the reference normalizer) -> the gitlab
    # details fill the empty field
    assert m["details"] == "gitlab details"

    # run 3: identical input -> nothing changes, no bucket rewritten
    files_before = dict(table.manifest()["files"])
    lin3 = ingest_advisories(table, {"gitlab": gl}, run_seq=3)
    assert lin3["rows_applied"] == 0
    assert dict(table.manifest()["files"]) == files_before

    # replaying an already-committed epoch is a no-op (exactly-once)
    assert ingest_advisories(table, {"gitlab": gl}, run_seq=3) is None


def test_ingest_transitive_chain_into_store(spark, tmp_path):
    """Two incoming records that only chain together transitively — and
    only one of which touches the stored record — must ALL land on the
    stored id."""
    table = create_vuln_table(spark, str(tmp_path / "vulns"), n_buckets=4)
    osv = _osv_frame(spark, [
        {"id": "OSV-10", "summary": "stored", "details": "",
         "aliases": ["CVE-1"], "modified": "2026-01-01T00:00:00Z"},
    ])
    ingest_advisories(table, {"osv": osv}, run_seq=1)

    gl = spark.createDataFrame(
        [
            ("G-1", ["CVE-1", "LINK-1"], "", "", None),
            ("G-2", ["LINK-1", "LINK-2"], "", "far end", None),
        ],
        GL_SCHEMA,
    )
    ingest_advisories(table, {"gitlab": gl}, run_seq=2)
    rows = {r["vuln_id"]: r for r in table.read().collect()}
    assert set(rows) == {"OSV-10"}
    m = rows["OSV-10"]
    assert {"CVE-1", "LINK-1", "LINK-2"} <= set(m["aliases"])
    assert m["details"] == "far end"
    assert m["sources"] == ["gitlab", "osv"]


def test_ingest_rejects_unknown_source(spark, tmp_path):
    import pytest

    table = create_vuln_table(spark, str(tmp_path / "v2"), n_buckets=2)
    df = spark.createDataFrame([("X-1", ["A"], "", "", None)], GL_SCHEMA)
    with pytest.raises(ValueError, match="unknown sources"):
        ingest_advisories(table, {"mystery": df}, run_seq=1)


def test_cli_ingest_osv_and_gitlab_tree(spark, tmp_path, capsys, monkeypatch):
    from vuln_datasync_spark import cli
    from vuln_datasync_spark.sinks.manifest_table import ManifestTable

    monkeypatch.setattr(cli, "_spark", lambda args: spark)
    osv_path = tmp_path / "osv.jsonl"
    osv_path.write_text(
        "\n".join(
            json.dumps(r)
            for r in [
                {"id": "OSV-77", "summary": "s77", "details": "d77",
                 "aliases": ["CVE-77"], "modified": "2026-02-01T00:00:00Z"},
            ]
        )
    )
    tree = tmp_path / "adv" / "npm" / "leftpad"
    tree.mkdir(parents=True)
    (tree / "CVE-77.yml").write_text(
        "identifier: GHSA-x7\n"
        "title: t77\n"
        "description: gitlab d77\n"
        "identifiers: [CVE-77, GHSA-x7]\n"
        "package_slug: npm/leftpad\n"
        "fixed_versions: ['2.0']\n"
        "modified_date: '2026-02-02'\n"
    )
    tbl = str(tmp_path / "vulns")
    assert cli.main([
        "ingest", "--table", tbl, "--run-seq", "1",
        "--osv-json", str(osv_path), "--gitlab-tree", str(tmp_path / "adv"),
    ]) == 0
    lineage = json.loads(capsys.readouterr().out.strip())
    assert lineage["rows_applied"] == 1  # one merged record

    t = ManifestTable(spark, tbl)
    rows = t.read().collect()
    assert len(rows) == 1
    m = rows[0]
    # alias overlap on CVE-77 merged the two sources under the osv id
    assert m["vuln_id"] == "OSV-77"
    assert m["sources"] == ["gitlab", "osv"]
    assert "GHSA-x7" in m["aliases"]
    assert m["package_name"] == "leftpad"
    assert m["fixed_versions"] == ["2.0"]


def test_ingest_id_collision_without_alias_overlap(spark, tmp_path):
    """An incoming record re-publishing a STORED id with disjoint aliases
    must fold with the stored row (key collision in the MERGE), not
    overwrite it — and untouched stored records must stay byte-identical."""
    table = create_vuln_table(spark, str(tmp_path / "vulns"), n_buckets=4)
    osv = _osv_frame(spark, [
        {"id": "OSV-1", "summary": "first summary", "details": "",
         "aliases": ["CVE-1"], "modified": "2026-01-01T00:00:00Z"},
        {"id": "OSV-2", "summary": "untouched", "details": "",
         "aliases": ["CVE-2"], "modified": "2026-01-01T00:00:00Z"},
    ])
    ingest_advisories(table, {"osv": osv}, run_seq=1)

    # republish OSV-1 with an entirely new alias set and NO summary
    osv2 = _osv_frame(spark, [
        {"id": "OSV-1", "summary": "", "details": "brand new details",
         "aliases": ["CVE-999"], "modified": "2026-03-01T00:00:00Z"},
    ])
    lin = ingest_advisories(table, {"osv": osv2}, run_seq=2)
    assert lin["rows_applied"] == 1
    rows = {r["vuln_id"]: r for r in table.read().collect()}
    assert set(rows) == {"OSV-1", "OSV-2"}
    m = rows["OSV-1"]
    # incoming is newer (higher modified_seq) so it ranks first, but its
    # summary is the OSV details-fallback; the stored alias set must merge
    assert {"CVE-1", "CVE-999"} <= set(m["aliases"])
    assert rows["OSV-2"]["summary"] == "untouched"


def test_ingest_per_source_recency_not_inflated_by_group_max(spark, tmp_path):
    """A source's fresh update whose own timestamp is below the GROUP max
    (because a lower-priority source committed a newer ts earlier) must
    still beat its own stale stored copy. Regression: exploding stored
    records with the single group-max modified_seq inflated every source's
    recency, so the fold kept the stale copy and the unchanged-hash skip
    silently dropped the update."""
    import datetime as dt

    table = create_vuln_table(spark, str(tmp_path / "vulns"), n_buckets=4)
    jan10 = dt.datetime(2026, 1, 10)
    jan20 = dt.datetime(2026, 1, 20)
    feb01 = dt.datetime(2026, 2, 1)
    osv = spark.createDataFrame(
        [("OSV-1", ["CVE-100"], "old osv", "", jan10)], GL_SCHEMA
    )
    cve = spark.createDataFrame(
        [("CVE-100", ["CVE-100"], "cve summary", "cve details", feb01)],
        GL_SCHEMA,
    )
    ingest_advisories(table, {"osv": osv, "cve": cve}, run_seq=1)
    rows = {r["vuln_id"]: r for r in table.read().collect()}
    m = rows["OSV-1"]
    assert m["summary"] == "old osv"  # osv priority beats cve recency
    # per-source recency persisted, not the group max
    ords = dict(m["source_ords"])
    assert ords["osv"] == int(jan10.timestamp() * 1000)
    assert ords["cve"] == int(feb01.timestamp() * 1000)

    # osv re-publishes: newer than ITS stored copy, older than group max
    osv2 = spark.createDataFrame(
        [("OSV-1", ["CVE-100"], "new osv", "", jan20)], GL_SCHEMA
    )
    lin = ingest_advisories(table, {"osv": osv2}, run_seq=2)
    assert lin["rows_applied"] == 1  # NOT silently hash-skipped
    m = {r["vuln_id"]: r for r in table.read().collect()}["OSV-1"]
    assert m["summary"] == "new osv"
    assert dict(m["source_ords"])["osv"] == int(jan20.timestamp() * 1000)

    # same source, SAME timestamp, changed payload: incoming wins the
    # exact (priority, ord) tie — the reference's serial
    # incoming-merges-into-stored direction
    osv3 = spark.createDataFrame(
        [("OSV-1", ["CVE-100"], "tie osv", "", jan20)], GL_SCHEMA
    )
    lin = ingest_advisories(table, {"osv": osv3}, run_seq=3)
    assert lin["rows_applied"] == 1
    m = {r["vuln_id"]: r for r in table.read().collect()}["OSV-1"]
    assert m["summary"] == "tie osv"


def test_advisory_stream_resume_matches_batch(spark, tmp_path):
    """The sync pipeline as a resumable micro-batch tail: two batches with
    overlapping aliases, a crash between sink commit and checkpoint
    commit, resume — final store equals the batch pipeline's result and
    the interrupted batch replays as a no-op (exactly-once)."""
    import pandas as pd
    import pytest

    from vuln_datasync_spark.pipelines.advisory_ingest import (
        ingest_canonical,
        run_advisory_stream,
        to_canonical,
    )

    incoming = tmp_path / "incoming"
    incoming.mkdir()

    def _write(name, rows):
        # explicit arrow schema: empty lists / sparse columns must not
        # infer a non-string element type
        import pyarrow as pa
        import pyarrow.parquet as pq

        cols = [
            "vuln_id", "source", "summary", "details", "severity",
            "package_name", "ecosystem", "aliases",
            "affected_versions", "fixed_versions", "modified_at",
        ]
        schema = pa.schema(
            [pa.field(c, pa.string()) for c in cols[:7]]
            + [pa.field(c, pa.list_(pa.string())) for c in cols[7:10]]
            + [pa.field("modified_at", pa.timestamp("us"))]
        )
        df = pd.DataFrame(rows, columns=cols)
        pq.write_table(
            pa.Table.from_pandas(df, schema=schema, preserve_index=False),
            incoming / name,
        )

    b1 = [("OSV-1", "osv", "one", "", "high", "pkg", "npm",
           ["CVE-5"], [], [], pd.Timestamp("2026-01-01"))]
    b2 = [("G-1", "gitlab", "", "two", "low", "pkg", "npm",
           ["CVE-5", "GHSA-2"], [], ["2.0"], pd.Timestamp("2026-01-02"))]
    _write("b1.parquet", b1)
    _write("b2.parquet", b2)

    tbl = str(tmp_path / "tbl")
    ckpt = str(tmp_path / "ckpt")
    seen = []

    def crash_after_first(batch_id, lineage):
        seen.append((batch_id, lineage))
        if len(seen) == 1:
            raise RuntimeError("simulated crash after sink commit")

    with pytest.raises(Exception, match="simulated crash"):
        run_advisory_stream(
            spark, str(incoming), tbl, ckpt,
            max_files_per_trigger=1, on_batch=crash_after_first,
        )
    assert len(seen) == 1 and seen[0][1] is not None

    # resume: the interrupted batch replays as a committed-epoch no-op,
    # then the second batch lands
    replays = []
    table = run_advisory_stream(
        spark, str(incoming), tbl, ckpt,
        max_files_per_trigger=1,
        on_batch=lambda bid, lin: replays.append((bid, lin)),
    )
    assert replays[0][1] is None  # exactly-once: epoch already committed

    rows = {r["vuln_id"]: r for r in table.read().collect()}
    assert set(rows) == {"OSV-1"}
    m = rows["OSV-1"]
    assert m["summary"] == "one" and m["details"] == "two"
    assert m["sources"] == ["gitlab", "osv"]
    assert {"CVE-5", "GHSA-2"} <= set(m["aliases"])

    # equals the batch pipeline run over the same two batches
    t2 = create_vuln_table(spark, str(tmp_path / "tbl2"), n_buckets=16)
    sch = (
        "vuln_id string, source string, summary string, details string, "
        "severity string, package_name string, ecosystem string, "
        "aliases array<string>, affected_versions array<string>, "
        "fixed_versions array<string>, modified_at timestamp"
    )
    for i, rows_i in enumerate([b1, b2]):
        df = spark.createDataFrame(
            [tuple(r[:-1]) + (r[-1].to_pydatetime(),) for r in rows_i], sch
        )
        ingest_canonical(t2, to_canonical(df), run_seq=i)
    cols = ["vuln_id", "summary", "details", "aliases", "sources",
            "source_ords", "modified_seq"]
    a = {tuple(str(r[c]) for c in cols) for r in table.read().collect()}
    b = {tuple(str(r[c]) for c in cols) for r in t2.read().collect()}
    assert a == b


def test_cli_ingest_stream(spark, tmp_path, capsys, monkeypatch):
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from vuln_datasync_spark import cli

    monkeypatch.setattr(cli, "_spark", lambda args: spark)
    incoming = tmp_path / "inc"
    incoming.mkdir()
    cols = [
        "vuln_id", "source", "summary", "details", "severity",
        "package_name", "ecosystem", "aliases",
        "affected_versions", "fixed_versions", "modified_at",
    ]
    schema = pa.schema(
        [pa.field(c, pa.string()) for c in cols[:7]]
        + [pa.field(c, pa.list_(pa.string())) for c in cols[7:10]]
        + [pa.field("modified_at", pa.timestamp("us"))]
    )
    df = pd.DataFrame(
        [("OSV-9", "osv", "nine", "", "low", "p", "npm",
          ["CVE-9"], [], [], pd.Timestamp("2026-03-01"))],
        columns=cols,
    )
    pq.write_table(
        pa.Table.from_pandas(df, schema=schema, preserve_index=False),
        incoming / "a.parquet",
    )
    assert cli.main([
        "ingest-stream", "--table", str(tmp_path / "t"),
        "--incoming", str(incoming), "--checkpoint", str(tmp_path / "ck"),
    ]) == 0
    out = json.loads(capsys.readouterr().out.strip())
    assert out == {"rows": 1, "batches_applied": 1}
