"""Extra benchmarks for optimization work (bench.py is FROZEN for
measurement; this file exists so the round's iteration loop does not touch
it — guide §1.4 noop-sink isolation, per-query repeats, and plan capture).

Usage:
  python bench_extra.py queries [name ...]     # time headline (or named)
                                               # queries, N repeats
  python bench_extra.py plans <outdir> [name ...]  # dump explain("formatted")
  python bench_extra.py cdc [mode]             # time one replay (default auto)

Env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS (same contract as bench.py),
BENCH_EXTRA_REPS (default 3).
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "8")
REPS = int(os.environ.get("BENCH_EXTRA_REPS", "3"))


def _spark():
    from vuln_datasync_spark.session import get_spark

    extra = {}
    if os.environ.get("BENCH_EXTRA_EVENTLOG") == "1":
        os.makedirs("/tmp/spark-events", exist_ok=True)
        extra = {
            "spark.eventLog.enabled": "true",
            "spark.eventLog.dir": "/tmp/spark-events",
        }
    return get_spark(
        "vds-bench-extra", master=f"local[{CPUS}]", extra_conf=extra
    )


def _headline():
    import bench

    return bench.HEADLINE


def _warmup(spark):
    spark.read.parquet(f"{SF_DIR}/lineitem.parquet").write.format(
        "noop"
    ).mode("overwrite").save()


def cmd_queries(names):
    from vuln_datasync_spark.plans.queries import query_map

    spark = _spark()
    qmap = query_map()
    names = names or _headline()
    _warmup(spark)
    out = {}
    for rep in range(REPS):
        for name in names:
            spark.sparkContext.setJobDescription(f"bench_extra:{name}")
            t0 = time.monotonic()
            qmap[name](spark, SF_DIR).write.format("noop").mode(
                "overwrite"
            ).save()
            out.setdefault(name, []).append(
                round(time.monotonic() - t0, 3)
            )
            spark.sparkContext.setJobDescription(None)
    res = {
        "sf_dir": SF_DIR,
        "cpus": CPUS,
        "reps": REPS,
        "samples": out,
        "min": {k: min(v) for k, v in out.items()},
        "total_min": round(sum(min(v) for v in out.values()), 3),
    }
    print(json.dumps(res))
    spark.stop()


def cmd_phases(names):
    """Split each query's time into DataFrame construction (incl. any
    driver-side actions the builder runs: localCheckpoint, head(), index
    builds) vs execution of the final noop write."""
    from vuln_datasync_spark.plans.queries import query_map

    spark = _spark()
    qmap = query_map()
    names = names or _headline()
    _warmup(spark)
    out = {}
    for rep in range(REPS):
        for name in names:
            spark.sparkContext.setJobDescription(f"phase:{name}")
            t0 = time.monotonic()
            df = qmap[name](spark, SF_DIR)
            t1 = time.monotonic()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.monotonic()
            out.setdefault(name, []).append(
                [round(t1 - t0, 3), round(t2 - t1, 3)]
            )
    print(json.dumps({"sf_dir": SF_DIR, "cpus": CPUS, "phases": out}))
    spark.stop()


def cmd_plans(outdir, names):
    from vuln_datasync_spark.plans.queries import query_map

    os.makedirs(outdir, exist_ok=True)
    spark = _spark()
    qmap = query_map()
    names = names or _headline()
    for name in names:
        df = qmap[name](spark, SF_DIR)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        with open(os.path.join(outdir, f"{name}.txt"), "w") as f:
            f.write(plan)
        print(f"wrote {name}")
    spark.stop()


def cmd_cdc(mode):
    import bench

    spark = _spark()
    log_dir = bench.ensure_changelog(bench.N_EVENTS)
    out = bench.replay(spark, log_dir, mode)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    cmd = sys.argv[1] if len(sys.argv) > 1 else "queries"
    if cmd == "queries":
        cmd_queries(sys.argv[2:])
    elif cmd == "phases":
        cmd_phases(sys.argv[2:])
    elif cmd == "plans":
        cmd_plans(sys.argv[2], sys.argv[3:])
    elif cmd == "cdc":
        cmd_cdc(sys.argv[2] if len(sys.argv) > 2 else "auto")
    else:
        raise SystemExit(f"unknown command {cmd}")
