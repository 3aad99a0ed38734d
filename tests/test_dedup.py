"""Edit-distance verification gate for near-dup candidate pairs."""

def test_verify_pairs_editdist(spark):
    from vuln_datasync_spark.operators.dedup import verify_pairs_editdist

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox jumps over the lazy dogs"),  # +1
            (3, "entirely different content with nothing shared"),
            (4, "x"),
            (5, "y"),
        ],
        "id long, text string",
    )
    pairs = spark.createDataFrame(
        [(1, 2), (1, 3), (4, 5)], "id_a long, id_b long"
    )
    got = {
        (r.id_a, r.id_b): (r.edit_dist, r.edit_ratio)
        for r in verify_pairs_editdist(
            docs=docs, pairs=pairs, text_col="text", id_col="id",
            max_ratio=0.2,
        ).collect()
    }
    # (1,2): dist 1 over 45 chars -> accepted; (1,3): rejected;
    # (4,5): dist 1 over max(1,1)=1 -> ratio 1.0 rejected
    assert set(got) == {(1, 2)}
    assert got[(1, 2)][0] == 1 and abs(got[(1, 2)][1] - 1 / 45) < 1e-3

    # max_chars prefix bounds the cost AND the comparison window
    long_docs = spark.createDataFrame(
        [(1, "a" * 50 + "X" * 50), (2, "a" * 50 + "Y" * 50)],
        "id long, text string",
    )
    p = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
    [r] = verify_pairs_editdist(
        p, long_docs, "text", "id", max_ratio=1.0, max_chars=50
    ).collect()
    assert r.edit_dist == 0  # identical within the prefix


def test_cli_distinct(spark, tmp_path, capsys, monkeypatch):
    import json

    from vuln_datasync_spark import cli
    from vuln_datasync_spark.sinks.manifest_table import ManifestTable

    monkeypatch.setattr(cli, "_spark", lambda args: spark)
    tbl = str(tmp_path / "t")
    table = ManifestTable.create(spark, tbl, n_buckets=2)
    rows = [
        (i, "insert", f"r{i % 3}", f"f{i}.py", f"c{i}", "py", f"v{i % 7}",
         None, None)
        for i in range(1, 40)
    ]
    table.merge(
        spark.createDataFrame(
            rows,
            "commit_seq long, op string, repo string, path string, "
            "commit string, lang string, content string, ts timestamp, "
            "size_bytes long",
        ),
        "d", 0,
    )
    # global: 7 distinct contents (< k -> exact)
    assert cli.main(["distinct", "--table", tbl, "--col", "content"]) == 0
    assert json.loads(capsys.readouterr().out.strip()) == {
        "est_distinct": 7
    }
    # per group
    assert cli.main([
        "distinct", "--table", tbl, "--col", "content", "--by", "repo",
    ]) == 0
    out = {r["repo"]: r["est_distinct"]
           for r in json.loads(capsys.readouterr().out.strip())}
    assert set(out) == {"r0", "r1", "r2"} and all(v == 7 for v in out.values())
    # mergeable sketch rows + union estimate reproduce the direct answer
    sk = str(tmp_path / "sk")
    assert cli.main([
        "distinct", "--table", tbl, "--col", "content", "--by", "repo",
        "--sketch-out", sk,
    ]) == 0
    from vuln_datasync_spark.operators.sketch import kmv_merge_estimate

    [r] = kmv_merge_estimate(spark.read.parquet(sk), k=256).collect()
    assert r["est_distinct"] == 7
