"""North-rule packaging proof: the engine runs via
``spark-submit --py-files vds.zip`` with NOTHING else on the path —
the zip alone must carry every module the driver AND the Python
workers import (workers re-import pickled-by-reference functions, so a
missing module surfaces only at execution time, not submit time)."""

import json
import os
import shutil
import subprocess
import sys
import zipfile

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = shutil.which("spark-submit")


@pytest.mark.skipif(SPARK_SUBMIT is None, reason="spark-submit not on PATH")
def test_py_files_zip_replay(tmp_path):
    # 1. package: plain zip of the pure-python tree (the documented step)
    zpath = str(tmp_path / "vds.zip")
    pkg = os.path.join(REPO, "vuln_datasync_spark")
    with zipfile.ZipFile(zpath, "w") as z:
        for root, _dirs, files in os.walk(pkg):
            if "__pycache__" in root:
                continue
            for f in files:
                if f.endswith(".py"):
                    full = os.path.join(root, f)
                    z.write(full, os.path.relpath(full, REPO))

    # 2. changelog fixture written by THIS process (datagen is part of
    # the engine, but generating input is not what's under test here)
    sys.path.insert(0, REPO)
    from vuln_datasync_spark.datagen import (
        generate_changelog_pandas,
        write_changelog,
    )

    ev = generate_changelog_pandas(800, seed=7)
    log_dir = str(tmp_path / "log")
    write_changelog(ev, log_dir, n_files=2)

    # 3. run from an empty cwd with PYTHONPATH stripped: only --py-files
    # can supply the package
    shim = str(tmp_path / "main.py")
    shutil.copy(os.path.join(REPO, "spark_submit_main.py"), shim)
    env = {
        k: v
        for k, v in os.environ.items()
        if k not in ("PYTHONPATH", "SPARK_HOME")
    }
    tbl = str(tmp_path / "tbl")
    out = subprocess.run(
        [
            SPARK_SUBMIT,
            "--master", "local[2]",
            "--conf", "spark.sql.shuffle.partitions=4",
            "--py-files", zpath,
            shim,
            "replay",
            "--changelog", log_dir,
            "--table", tbl,
            "--buckets", "4",
        ],
        cwd=str(tmp_path),
        env=env,
        capture_output=True,
        text=True,
        timeout=420,
    )
    assert out.returncode == 0, out.stdout[-2000:] + out.stderr[-2000:]
    lineage = json.loads(out.stdout.strip().splitlines()[-1])
    assert lineage["rows_applied"] > 0

    # 4. verify the produced table from the test session
    from vuln_datasync_spark.datagen import replay_oracle
    from vuln_datasync_spark.sinks.manifest_table import ManifestTable

    from vuln_datasync_spark.session import get_spark

    # getOrCreate: reuses the suite's session when one is active
    spark = get_spark("vds-tests", master="local[4]", shuffle_partitions=8)
    table = ManifestTable(spark, tbl)
    got = table.read().count()
    want = len(replay_oracle(ev))
    assert got == want
