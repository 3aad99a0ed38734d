"""Driver-window discipline guards: the correctness artifact records only
the FIRST 50 entries of queries() in iteration order (empirical, r02-r04),
so _DRIVER_PRIORITY must stay exactly 50 valid, unique names, with the
round's must-attest block leading. A silent typo or an unrotated addition
here costs a full round of attestation."""

from vuln_datasync_spark.plans.queries import (
    QUERIES,
    _DRIVER_PRIORITY,
    oracle_sql_map,
    query_map,
)

# the round-6 must-attest block: entries whose latest driver attestation
# was r03 (the r05 verdict's staleness list — attestation must not age
# past two rounds)
ROUND6_CRITICAL = [
    "a1_total_count",
    "a2_count_by_source",
    "a3_count_by_ecosystem",
    "f5_summary_truncation",
    "f11_json_field_extract",
    "m6_deterministic_id",
    "m7_id_validation",
    "m8_content_hash",
    "mg_coalesce_fields",
    "mg_richness_merge",
    "mm_binary_metadata",
    "mm_extract_features",
    "mm_sample_frames",
    "o1_topk_recent",
    "o2_pagination_offset",
    "o3_priority_pickup",
    "o5_recent_activity",
    "p4_required_field_filter",
    "p9_recency_filter",
    "u1_multi_source_union",
    "u3_array_membership",
    "w1_running_total",
]


def test_window_is_exactly_50_valid_unique_names():
    names = {q.name for q in QUERIES}
    assert len(_DRIVER_PRIORITY) == 50
    assert len(set(_DRIVER_PRIORITY)) == 50
    unknown = [n for n in _DRIVER_PRIORITY if n not in names]
    assert not unknown, f"priority names not in catalog: {unknown}"


def test_critical_block_leads_the_window():
    assert _DRIVER_PRIORITY[: len(ROUND6_CRITICAL)] == ROUND6_CRITICAL


def test_query_map_order_and_oracle_coverage():
    qm = list(query_map())
    assert qm[:50] == _DRIVER_PRIORITY
    # every windowed entry must have an oracle (rows-only attestation is
    # the weak form — nothing in the window should settle for it)
    osm = oracle_sql_map()
    missing = [n for n in qm[:50] if n not in osm]
    assert not missing, f"windowed entries without oracle SQL: {missing}"
    # catalog names unique
    names = [q.name for q in QUERIES]
    assert len(names) == len(set(names))
