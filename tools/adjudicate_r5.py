"""Round-5 interleaved re-measure of the r04 driver-window perf suspects
(VERDICT r04 "Next round" #4), using the round-3 methodology: repeated
trials of each suspect INTERLEAVED in one warm session so every trial of
every suspect shares host conditions, bracketed by bench.py's pure-CPU
capacity probe. Suspects:

  * cdc_replay   — driver saw 232k ev/s (r03 driver: 413k)
  * ingest trio  — driver saw 11.3/14.4/9.1 s (builder window 5.6/5.4/3.5)
  * tx_lang_id   — driver saw 1.51 s (r03: 0.77 s), pure column exprs
  * dd_ngram_jaccard — driver saw 2.46 s; real cause (shingle recompute)
    fixed this round — target <= its r03 time (~1.8 s)

Prints one JSON line with per-trial timings + probe brackets.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402
from vuln_datasync_spark.plans.queries import query_map  # noqa: E402
from vuln_datasync_spark.session import get_spark  # noqa: E402

ROUNDS = int(os.environ.get("ADJ_ROUNDS", "4"))


def main():
    qmap = query_map()
    spark = get_spark("vds-adjudicate", master=f"local[{bench.CPUS}]")
    log_dir = bench.ensure_changelog(bench.N_EVENTS)

    # session warmup (codegen, parquet footers, python workers)
    spark.read.parquet(f"{bench.SF_DIR}/lineitem.parquet").write.format(
        "noop"
    ).mode("overwrite").save()

    out: dict = {
        "sf_dir": bench.SF_DIR,
        "cpus": bench.CPUS,
        "rounds": ROUNDS,
        "probe_before": round(bench._cpu_capacity(4), 1),
        "trials": {
            "cdc_replay_eps": [],
            "ingest_cold_sec": [],
            "ingest_merge_sec": [],
            "ingest_noop_sec": [],
            "tx_lang_id_sec": [],
            "dd_ngram_jaccard_sec": [],
        },
        "probes_mid": [],
    }

    def timed_query(name: str) -> float:
        t0 = time.monotonic()
        qmap[name](spark, bench.SF_DIR).write.format("noop").mode(
            "overwrite"
        ).save()
        return round(time.monotonic() - t0, 3)

    for i in range(ROUNDS):
        r = bench.replay(spark, log_dir, "auto", warmup=(i == 0))
        out["trials"]["cdc_replay_eps"].append(r["events_per_sec"])
        out["trials"]["tx_lang_id_sec"].append(timed_query("tx_lang_id"))
        ing = bench.bench_ingest(spark)
        out["trials"]["ingest_cold_sec"].append(ing["cold_50k_sec"])
        out["trials"]["ingest_merge_sec"].append(ing["merge_10k_sec"])
        out["trials"]["ingest_noop_sec"].append(ing["noop_resync_sec"])
        out["trials"]["dd_ngram_jaccard_sec"].append(
            timed_query("dd_ngram_jaccard")
        )
        out["probes_mid"].append(round(bench._cpu_capacity(4), 1))

    out["probe_after"] = round(bench._cpu_capacity(4), 1)
    med = lambda xs: sorted(xs)[len(xs) // 2]  # noqa: E731
    out["medians"] = {k: med(v) for k, v in out["trials"].items()}
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
