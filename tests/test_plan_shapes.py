"""Plan-shape regression guards: the physical-plan properties the
100 TB design depends on must not silently degrade (broadcast stays
broadcast, point filters reach the parquet scan, aggregates stay
hash-based inside whole-stage codegen, map-only ops stay shuffle-free,
top-k stays TakeOrdered rather than a global sort)."""

import pytest
from pyspark.sql import functions as F

from vuln_datasync_spark.plans.queries import QUERIES

SF = "/root/testdata/sf0.001"
_BY_NAME = {qd.name: qd for qd in QUERIES}


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_broadcast_dim_join_stays_broadcast(spark):
    plan = _plan(_BY_NAME["j2_broadcast_dim_join"].spark_fn(spark, SF))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_point_lookup_filter_reaches_parquet_scan(spark):
    import re

    plan = _plan(_BY_NAME["j3_point_lookup_join"].spark_fn(spark, SF))
    pushed = re.findall(r"PushedFilters: \[([^\]]*)\]", plan)
    # at least one scan carries a real pushed predicate
    assert any(p.strip() for p in pushed), plan


def test_pricing_summary_hash_aggregates_with_partial(spark):
    plan = _plan(_BY_NAME["q1_tpch_pricing_summary"].spark_fn(spark, SF))
    assert "HashAggregate" in plan
    assert "SortAggregate" not in plan
    # map-side combine: a partial aggregate must sit below the exchange
    assert "partial_sum" in plan


def test_map_only_ops_have_no_shuffle(spark):
    """pii_scrub and quantize_embeddings are pure per-row column exprs:
    any Exchange in their plan is a regression."""
    from vuln_datasync_spark.operators.corpus import pii_scrub
    from vuln_datasync_spark.operators.similarity import quantize_embeddings

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    plan = _plan(pii_scrub(docs, "text", "doc_id"))
    # "*(1)" is toString's whole-stage-codegen stage marker
    assert "Exchange" not in plan and "*(1)" in plan

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    plan = _plan(quantize_embeddings(emb, "embedding", "vec_id"))
    assert "Exchange" not in plan


def test_cosine_topk_is_take_ordered_not_global_sort(spark):
    from vuln_datasync_spark.operators.similarity import cosine_topk

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    q = [float(x) for x in emb.head()["embedding"]]
    plan = _plan(cosine_topk(emb, "embedding", "vec_id", q, k=5))
    assert "TakeOrderedAndProject" in plan


def test_column_pruning_reaches_scan(spark):
    """A two-column projection must not read the whole documents schema
    (ReadSchema shows only what survives pruning)."""
    df = spark.read.parquet(f"{SF}/documents.parquet").select(
        "doc_id", F.length("text").alias("n")
    )
    plan = _plan(df)
    seg = plan[plan.index("ReadSchema"):].splitlines()[0]
    assert "doc_id" in seg and "text" in seg
    assert "lang" not in seg and "source" not in seg and "n_chars" not in seg


def test_session_funnel_scd2_single_exchange(spark):
    """sessionize/funnel/scd2 chain all their window expressions over
    ONE partitioning: a second Exchange would mean the shared-window
    construction regressed into per-step shuffles."""
    for name in ("ev_sessionize", "ev_funnel", "cdc_scd2_history"):
        plan = _plan(_BY_NAME[name].spark_fn(spark, SF))
        assert plan.count("Exchange hashpartitioning") == 1, (name, plan)


def test_interval_join_never_nested_loop(spark):
    """The whole point of the bucketed rewrite: a hash join on the
    bucket key, never BroadcastNestedLoop/Cartesian."""
    plan = _plan(_BY_NAME["j9_interval_join"].spark_fn(spark, SF))
    assert "BroadcastNestedLoop" not in plan
    assert "Cartesian" not in plan
    assert "HashJoin" in plan or "SortMergeJoin" in plan


def test_kmv_candidate_shuffle_not_proportional_to_rows(spark):
    """kmv_distinct's only wide edge is the candidate frame emitted by
    mapInPandas: the exchange must sit ABOVE the Python stage (bytes
    ∝ partitions*k), never below it on the raw hashed rows."""
    plan = _plan(_BY_NAME["agg_kmv_distinct"].spark_fn(spark, SF))
    # plan toString is physical-order: child plans print BELOW parents,
    # so the mapInPandas line must appear after (deeper than) every
    # Exchange line
    lines = plan.splitlines()
    py_depth = min(
        i for i, l in enumerate(lines) if "MapInPandas" in l
    )
    for i, l in enumerate(lines):
        if "Exchange" in l and "Reused" not in l:
            assert i < py_depth, f"shuffle below mapInPandas:\n{plan}"


def test_frequent_items_recount_is_semi_join(spark):
    plan = _plan(_BY_NAME["agg_frequent_items"].spark_fn(spark, SF))
    assert "LeftSemi" in plan, plan


def test_mor_resolution_only_where_logs_exist(spark, tmp_path):
    """The COW read path must not pay for merge-on-read: a table with no
    outstanding logs plans a plain scan (no Window resolution operator),
    while a logged MOR table plans exactly one per-key Window — and after
    compact_logs the Window disappears again."""
    from vuln_datasync_spark.sinks.manifest_table import ManifestTable
    from vuln_datasync_spark.streaming.pipeline import apply_batch

    from .test_cdc_e2e import CHANGELOG_SCHEMA
    from vuln_datasync_spark.datagen import (
        generate_changelog_pandas,
        write_changelog,
    )

    ev = generate_changelog_pandas(1500, seed=61)
    files = write_changelog(ev, str(tmp_path / "log"), n_files=2)
    t = ManifestTable.create(
        spark, str(tmp_path / "t"), n_buckets=4, merge_mode="mor"
    )
    for i, f in enumerate(files):
        apply_batch(
            spark.read.schema(CHANGELOG_SCHEMA).parquet(f), t, "ps", i
        )
    assert any((t.manifest().get("logs") or {}).values())
    logged_plan = _plan(t.read())
    assert "Window" in logged_plan  # read-time LWW resolution
    t.compact_logs()
    compacted_plan = _plan(t.read())
    assert "Window" not in compacted_plan  # back to a plain pruned scan


def test_bucketed_join_elides_both_exchanges(spark, tmp_path):
    """Two tables written with save_bucketed on the same key and bucket
    count must join with NO Exchange on either side — the co-located
    big-big join the 100 TB design leans on (a shuffle here would move
    both full tables across the network)."""
    from vuln_datasync_spark.sinks.warehouse import (
        bucketed_join,
        save_bucketed,
    )

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    facts = docs.select("doc_id", "n_chars")
    dims = docs.select("doc_id", "lang", "source")
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.sql("DROP TABLE IF EXISTS _psb_facts")
    spark.sql("DROP TABLE IF EXISTS _psb_dims")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        save_bucketed(facts, "_psb_facts", "doc_id", 8, sort_cols="doc_id")
        save_bucketed(dims, "_psb_dims", "doc_id", 8, sort_cols="doc_id")
        joined = bucketed_join(spark, "_psb_facts", "_psb_dims", "doc_id")
        plan = _plan(joined)
        assert "SortMergeJoin" in plan, plan
        assert "Exchange" not in plan, plan
        # and the result is still correct
        assert joined.count() == docs.count()
        # the non-bucketed control DOES shuffle — proves the assertion
        # above is load-bearing, not vacuous
        control = facts.join(dims, "doc_id")
        assert "Exchange" in _plan(control)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS _psb_facts")
        spark.sql("DROP TABLE IF EXISTS _psb_dims")


def test_multimodal_real_decode_is_map_only(spark):
    """planted_ppm_table -> resize -> extract_features is a pure map
    pipeline: any Exchange means the media pipeline started shuffling
    payload bytes — the exact thing the 100 TB design forbids before
    the (tiny) feature output exists."""
    from vuln_datasync_spark.operators.multimodal import (
        extract_features,
        planted_ppm_table,
        resize_media,
    )

    d = spark.range(50).selectExpr("id as doc_id")
    m = planted_ppm_table(d, "doc_id")
    f = extract_features(resize_media(m, 5, 4, decode_stub=False),
                         decode_stub=False)
    assert "Exchange" not in _plan(f)


def test_kmv_merge_estimate_input_is_sketch_sized(spark):
    """kmv_merge_estimate must plan over the exploded sketch arrays
    (segments*k rows), never re-scan source data: its plan contains no
    parquet scan and exactly the candidate-frame shuffle."""
    from vuln_datasync_spark.operators.sketch import (
        kmv_merge_estimate,
        kmv_sketch,
    )

    df = spark.range(5000).selectExpr(
        "id % 4 as seg", "id % 997 as v"
    )
    sk = kmv_sketch(df, ["seg"], "v", k=32).localCheckpoint()
    plan = _plan(kmv_merge_estimate(sk, k=32))
    assert "FileScan" not in plan and "parquet" not in plan.lower()


def test_envelope_parse_is_map_only(spark):
    """Debezium/Maxwell parsing is pure from_json projection: any
    Exchange (or Python evaluation) in the parse plan is a regression —
    at 10^10 events the parse must fan out with the scan partitions."""
    from vuln_datasync_spark.sources.debezium import (
        parse_debezium,
        parse_maxwell,
    )

    df = spark.createDataFrame([("{}",)], "value string")
    for parse in (parse_debezium, parse_maxwell):
        plan = _plan(parse(df))
        assert "Exchange" not in plan, plan
        assert "BatchEvalPython" not in plan and "ArrowEval" not in plan


def test_y4m_frame_sampling_no_shuffle_before_stats(spark):
    """sample_frames_y4m decodes and reduces INSIDE the scan partition
    (mapInPandas); the video bytes must never hit an Exchange."""
    from vuln_datasync_spark.operators.multimodal import (
        planted_y4m_table,
        sample_frames_y4m,
    )

    d = spark.read.parquet(f"{SF}/documents.parquet").filter(
        F.col("doc_id") < 50
    )
    plan = _plan(sample_frames_y4m(planted_y4m_table(d, "doc_id")))
    assert "Exchange" not in plan, plan
    assert "MapInPandas" in plan
