"""Cross-source merge resolution — the reference's multi-source semantics
(SURVEY.md §2.5 M3/M4/M5, A7/A8/A9) as one declarative select.

Reference behavior (/root/reference/internal/merger/merger.go):
  * source priority osv(1) > gitlab(2) > cve(3) picks the "primary" record
    (merger.go:17-29, 139-170);
  * scalars: first-non-empty of (primary, secondary) (merger.go:173-204);
  * arrays: order-preserving dedup-union, primary first (merger.go:254-275);
  * maps: secondary first, primary overrides per key (merger.go:278-302);
  * alternate richness heuristic: longer text + most-recent timestamp wins
    (normalizer.go:375-428).

Spark restatement: rank per key by (priority, inverse order), take rows 1-2
via conditional aggregation, then coalesce/array_union/map_zip_with — no
per-row Python, one shuffle.
"""

from __future__ import annotations

import logging

from pyspark.sql import Column, DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..functions.hashing import sanitize_aliases

logger = logging.getLogger("vuln_datasync_spark.merge")

SOURCE_PRIORITY = {"osv": 1, "gitlab": 2, "cve": 3}


def source_priority_col(source: Column | str) -> Column:
    c = F.col(source) if isinstance(source, str) else source
    expr = F.lit(99)
    for name, p in sorted(SOURCE_PRIORITY.items(), key=lambda kv: -kv[1]):
        expr = F.when(c == name, p).otherwise(expr)
    return expr


def coalesce_nonempty(primary: Column, secondary: Column) -> Column:
    """selectString analog (merger.go:173-185): first non-empty string."""
    return F.coalesce(F.nullif(primary, F.lit("")), secondary)


def map_merge_with_precedence(primary: Column, secondary: Column) -> Column:
    """Map merge, primary overrides per key (merger.go:278-302). Note
    map_concat keeps the FIRST occurrence in Spark 4 under LAST_WIN=false
    semantics variance — map_zip_with is explicit and portable."""
    return F.map_zip_with(primary, secondary, lambda _k, p, s: F.coalesce(p, s))


def priority_merge(
    df: DataFrame,
    key_cols: list[str],
    scalar_cols: list[str],
    array_cols: list[str] | None = None,
    source_col: str = "source",
    order_col: str = "commit_seq",
) -> DataFrame:
    """Resolve multi-source records per key: the best-priority record is
    primary, the next supplements missing fields (M3+M4).

    Rank rows per key with ONE window over the full rank struct (priority,
    -order, payload — the same total order ``sort_array(collect_list(...))``
    would give), then keep ranks 1-2 via conditional ``min`` aggregates.
    Aggregation state is O(1) per key regardless of group size — a hot key
    (e.g. a mass-aliased advisory feeding ``merge_by_alias_overlap``) never
    buffers its whole group, which ``collect_list`` would. The window's
    hash partitioning on ``key_cols`` satisfies the following groupBy, so
    the plan still has exactly one shuffle.
    """
    array_cols = array_cols or []
    pri = source_priority_col(source_col)
    rank_struct = F.struct(
        pri.alias("_p"),
        (-F.col(order_col)).alias("_no"),
        F.struct(
            *[F.col(c) for c in scalar_cols + array_cols + [source_col, order_col]]
        ).alias("_r"),
    )
    ranked = df.withColumn("_rs", rank_struct).withColumn(
        "_rn",
        F.row_number().over(W.partitionBy(*key_cols).orderBy(F.col("_rs"))),
    )
    agg = ranked.groupBy(*key_cols).agg(
        F.min(F.when(F.col("_rn") == 1, F.col("_rs"))).alias("w1"),
        # null (not ANSI error) when the key has a single source
        F.min(F.when(F.col("_rn") == 2, F.col("_rs"))).alias("w2"),
        F.count("*").alias("n_sources"),
    )
    p = F.col("w1._r")
    s = F.when(F.col("n_sources") > 1, F.col("w2._r"))
    out_cols: list[Column] = [F.col(c) for c in key_cols]
    for c in scalar_cols:
        out_cols.append(coalesce_nonempty(p[c], s[c]).alias(c))
    for c in array_cols:
        out_cols.append(
            F.array_union(
                F.coalesce(p[c], F.array()), F.coalesce(s[c], F.array())
            ).alias(c)
        )
    out_cols.append(
        F.when(
            F.col("n_sources") > 1, F.array_sort(F.array(p[source_col], s[source_col]))
        )
        .otherwise(F.array(p[source_col]))
        .alias("sources")
    )
    out_cols.append(F.greatest(p[order_col], s[order_col]).alias(order_col))
    return agg.select(*out_cols)


def fold_merge(
    df: DataFrame,
    key_cols: list[str],
    scalar_cols: list[str],
    array_cols: list[str] | None = None,
    source_col: str = "source",
    order_col: str = "commit_seq",
    tiebreak_col: str | None = None,
    with_source_ords: bool = False,
) -> DataFrame:
    """N-ary merge: the batch restatement of the reference's SERIAL fold —
    each record merges pairwise into the stored one, so over a whole group
    the net effect is: scalars = the best-ranked non-empty value, arrays =
    first-occurrence-preserving union across ALL members in rank order,
    sources = distinct union, order = max (MergeVulnerabilities applied
    record-by-record, /root/reference/internal/merger/merger.go:124-170).
    ``priority_merge`` is the 2-source (primary+secondary) analog; this one
    is for groups of unbounded size (alias-closure components).

    Rank = row_number over the same (priority, -order, payload) total order
    priority_merge uses. SINGLE PASS: array elements are exploded tagged
    with (column, rank, position) ABOVE the window (Generate preserves the
    window's hash partitioning, so the following groupBy adds NO second
    exchange), and one aggregation produces everything — the upstream plan
    executes exactly once (a per-array-column join variant was measured to
    re-execute the whole upstream per branch: AQE does not reuse the
    exchanges because column pruning specializes each branch's scan).

    Aggregation state: scalars are O(1) per key (explode-duplication is
    harmless — conditional ``min`` is duplicate-insensitive, as are
    ``collect_set``/``max``); each output array buffers its group's tagged
    elements (O(total array payload of the group) — elements + two ints,
    never the rows' scalar payloads), then sorts by first occurrence and
    dedups. The output array itself is the same order-preserving union.

    ``tiebreak_col``: optional numeric column breaking exact
    (priority, order) ties — HIGHER values rank first (the ingest pipeline
    tags incoming rows 1 / stored rows 0 so a same-source same-timestamp
    re-publish resolves to the incoming copy, matching the reference's
    serial incoming-merges-into-stored direction).

    ``with_source_ords=True`` adds a ``source_ords`` map column — each
    contributing source's own max ``order_col`` — so a store can persist
    PER-SOURCE recency instead of collapsing the group to one max (which
    would inflate every source's recency to the group max and make a
    genuinely fresh re-publish lose the rank to its own stale stored
    copy). Built from a collect_set of (source, ord) pairs — duplicate-
    insensitive under the array explode — reduced to max-per-source with
    an array filter, never a second aggregation pass."""
    array_cols = array_cols or []
    pri = source_priority_col(source_col)
    rank_fields = [pri.alias("_p"), (-F.col(order_col)).alias("_no")]
    if tiebreak_col is not None:
        rank_fields.append((-F.col(tiebreak_col)).alias("_tb"))
    rank_struct = F.struct(
        *rank_fields,
        F.struct(
            *[F.col(c) for c in scalar_cols + array_cols + [source_col, order_col]]
        ).alias("_r"),
    )
    ranked = df.withColumn(
        "_rn",
        F.row_number().over(W.partitionBy(*key_cols).orderBy(rank_struct)),
    )
    scalar_aggs = [
        F.min(
            F.when(
                F.nullif(F.col(c), F.lit("")).isNotNull(),
                F.struct(F.col("_rn").alias("_k"), F.col(c).alias("_v")),
            )
        )["_v"].alias(c)
        for c in scalar_cols
    ]
    base_aggs = [
        *scalar_aggs,
        F.array_sort(F.collect_set(source_col)).alias("sources"),
        F.max(order_col).alias(order_col),
    ]
    extra_out: list = []
    if with_source_ords:
        base_aggs.append(
            F.array_sort(
                F.collect_set(
                    F.struct(
                        F.col(source_col).alias("source"),
                        F.col(order_col).alias("ord"),
                    )
                )
            ).alias("_srcord")
        )
        # sorted (source asc, ord asc): the LAST entry of each source run
        # carries that source's max ord — keep exactly those
        extra_out.append(
            F.expr(
                "map_from_entries(filter(_srcord, (x, i) -> "
                "i = size(_srcord) - 1 OR _srcord[i+1].source != x.source))"
            ).alias("source_ords")
        )
    if not array_cols:
        out = ranked.groupBy(*key_cols).agg(*base_aggs)
        return out.select(
            *key_cols, *scalar_cols, "sources", order_col, *extra_out
        )

    elem_types = {
        df.schema[c].dataType.elementType.simpleString() for c in array_cols
    }
    if len(elem_types) != 1:
        raise ValueError(
            f"fold_merge array_cols must share one element type, got "
            f"{sorted(elem_types)}"
        )
    # every element of every array column, tagged (col idx, position)
    def _tagger(ci: int):
        # factory, not a default arg: pyspark counts lambda PARAMETERS to
        # pick the higher-order-function arity
        return lambda x, i: F.struct(
            F.lit(ci).alias("_ci"), i.alias("_pos"), x.alias("_e")
        )

    combined = F.flatten(
        F.array(
            *[
                F.transform(F.coalesce(F.col(c), F.array()), _tagger(ci))
                for ci, c in enumerate(array_cols)
            ]
        )
    )
    exploded = ranked.select(
        *key_cols,
        "_rn",
        *scalar_cols,
        source_col,
        order_col,
        # _outer: rows whose arrays are all empty must still feed scalars
        F.posexplode_outer(combined).alias("_epos", "_el"),
    )
    array_aggs = [
        F.array_distinct(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(
                            F.col("_el._ci") == ci,
                            F.struct(
                                F.col("_rn").alias("_rn"),
                                F.col("_el._pos").alias("_pos"),
                                F.col("_el._e").alias("_e"),
                            ),
                        )
                    )
                ),
                lambda x: x["_e"],
            )
        ).alias(c)
        for ci, c in enumerate(array_cols)
    ]
    out = exploded.groupBy(*key_cols).agg(*base_aggs, *array_aggs)
    return out.select(
        *key_cols, *scalar_cols, *array_cols, "sources", order_col,
        *extra_out,
    )


def raw_data_envelope(primary: Column, secondary: Column) -> Column:
    """A9: wrap both sources' raw payloads in a provenance envelope map,
    omitting absent sides (mergeRawData,
    /root/reference/internal/merger/merger.go:305-316)."""
    return F.map_filter(
        F.create_map(
            F.lit("primary_source"),
            primary,
            F.lit("secondary_source"),
            secondary,
        ),
        lambda _k, v: v.isNotNull(),
    )


def alias_components(
    records: DataFrame,
    id_col: str = "vuln_id",
    alias_col: str = "aliases",
    source_col: str = "source",
    order_col: str = "commit_seq",
    max_iters: int = 10,
) -> DataFrame:
    """Connected components over the alias-overlap graph of ``records``:
    two records are connected when they share ANY sanitized alias, and
    connectivity is TRANSITIVE (A~B, B~C ⇒ one component even with no A~C
    alias). Returns ``(id_col, _leader)`` where ``_leader`` is the id of
    the component's best record by (source priority, newest order, id) —
    the same total order every other merge pick uses.

    The reference achieves closure by strictly serial inserts (each record
    merges into the store before the next is matched,
    /root/reference/internal/merger/merger.go:74-105 driven one-by-one from
    /root/reference/internal/jobs/server.go:864-907). Set-based
    restatement: iterative min-label propagation through the bipartite
    record–alias graph. Each iteration is two shuffles (groupBy alias, then
    groupBy record); labels are monotone non-increasing over a finite
    lattice, so it converges in at most the graph diameter (alias chains in
    vulnerability data are a few hops — 2-3 iterations in practice), and
    ``max_iters`` bounds the worst case. Convergence is logged, and label
    state per iteration is O(#records), never O(pairs).

    The returned frame is ``localCheckpoint``-ed (truncated lineage —
    downstream consumers replay nothing of the iterative loop) and the
    loop's own caches are unpersisted before returning, so repeated calls
    (sync runs, micro-batches) leak nothing: checkpoint blocks are
    reclaimed by the ContextCleaner once the caller drops its references,
    unlike persist() entries, which the cache manager pins forever.
    (localCheckpoint trades executor-loss resilience for that — fine for
    a batch operator; a lost-executor rerun restarts the merge.)"""
    label = F.struct(
        source_priority_col(source_col).alias("_p"),
        (-F.col(order_col)).alias("_no"),
        F.col(id_col).alias("_id"),
    )
    # ONE node per id: records may carry duplicate ids (the same vuln_id
    # from two sources is normal ingest input after unionByName) — without
    # this reduction, alias-less duplicate rows keep distinct initial
    # labels forever and the loop never converges (all max_iters run, a
    # spurious warning fires). min() picks each id's best-copy label, the
    # same (priority, -ord, id) total order every merge pick uses.
    nodes = (
        records.select(F.col(id_col).alias("_nid"), label.alias("_lbl"))
        .groupBy("_nid")
        .agg(F.min("_lbl").alias("_lbl"))
    )
    edges = (
        records.select(
            F.col(id_col).alias("_nid"),
            F.explode(sanitize_aliases(alias_col)).alias("_alias"),
        )
        .dropDuplicates(["_nid", "_alias"])
        .persist()
    )
    nodes = nodes.persist()
    iters = 0
    for iters in range(1, max_iters + 1):
        alias_min = (
            edges.join(nodes, "_nid")
            .groupBy("_alias")
            .agg(F.min("_lbl").alias("_albl"))
        )
        node_min = (
            edges.join(alias_min, "_alias")
            .groupBy("_nid")
            .agg(F.min("_albl").alias("_nlbl"))
        )
        # least() skips nulls: records with no (sanitized) aliases keep
        # their own label. The convergence flag rides the frame so the
        # count below is the SAME job that materializes the cache — no
        # second join against the previous iteration, one action total.
        new_nodes = (
            nodes.join(node_min, "_nid", "left")
            .select(
                "_nid",
                F.least("_lbl", "_nlbl").alias("_lbl"),
                (F.col("_nlbl") < F.col("_lbl")).alias("_chg"),
            )
            .persist()
        )
        changed = new_nodes.filter(F.col("_chg")).count()
        nodes.unpersist()
        nodes = new_nodes
        if changed == 0:
            break
    else:
        logger.warning(
            "alias_components: label propagation did not converge in %d "
            "iterations — components deeper than that remain split",
            max_iters,
        )
    logger.info("alias_components: converged after %d iterations", iters)
    out = nodes.select(
        F.col("_nid").alias(id_col), F.col("_lbl._id").alias("_leader")
    ).localCheckpoint(eager=True)
    nodes.unpersist()
    edges.unpersist()
    return out


def alias_overlap_match(
    incoming: DataFrame,
    existing: DataFrame,
    id_col: str = "vuln_id",
    alias_col: str = "aliases",
    source_col: str = "source",
    order_col: str = "commit_seq",
    with_order: bool = False,
) -> DataFrame:
    """J1: the reference's alias-overlap dedup join — for every incoming
    record, find the best existing record sharing ANY alias
    (/root/reference/sql/vulnerabilities.sql:7-17 `aliases && $1::text[]`
    with source-priority ordering + /root/reference/internal/merger/
    merger.go:74-121 FindMatchingVulnerability + filterValidAliases).

    Plan: sanitize aliases (engine-generated VULN ids never match), explode
    BOTH sides to (id, alias) rows, equi-join on the alias (shuffle on the
    alias key — never a cross join; an alias shared by many records is the
    skew unit and AQE skew-join splits it), then one winner per incoming id
    via row_number over (source priority, newest first, id tiebreak).

    Returns (incoming_id, matched_id, matched_source) — incoming records
    with no overlap are absent (the reference returns nil -> new record
    path). ``with_order=True`` appends the matched record's order value as
    ``matched_ord`` (callers that re-rank matches across a group need it to
    break priority ties the same way this window does).
    """
    inc = incoming.select(
        F.col(id_col).alias("incoming_id"),
        F.explode(sanitize_aliases(alias_col)).alias("_alias"),
    ).dropDuplicates(["incoming_id", "_alias"])
    ex = existing.select(
        F.col(id_col).alias("matched_id"),
        F.col(source_col).alias("matched_source"),
        F.col(order_col).alias("_ord"),
        F.explode(sanitize_aliases(alias_col)).alias("_alias"),
    ).dropDuplicates(["matched_id", "_alias"])
    j = inc.join(ex, "_alias")
    w = W.partitionBy("incoming_id").orderBy(
        source_priority_col("matched_source"),
        F.desc("_ord"),
        "matched_id",
    )
    out_cols = ["incoming_id", "matched_id", "matched_source"]
    if with_order:
        out_cols.append(F.col("_ord").alias("matched_ord"))
    return (
        j.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(*out_cols)
    )


def merge_by_alias_overlap(
    incoming: DataFrame,
    existing: DataFrame,
    scalar_cols: list[str],
    array_cols: list[str] | None = None,
    id_col: str = "vuln_id",
    alias_col: str = "aliases",
    source_col: str = "source",
    order_col: str = "commit_seq",
    max_closure_iters: int = 10,
    tiebreak_col: str | None = None,
    with_source_ords: bool = False,
    precomputed_match: DataFrame | None = None,
) -> DataFrame:
    """The reference's full cross-source merge flow, alias-keyed: find the
    existing record each incoming one overlaps (FindMatchingVulnerability,
    /root/reference/internal/merger/merger.go:74-105), then merge the
    matched group field-wise under source priority (MergeVulnerabilities,
    merger.go:124-170). Incoming records with no overlap keep their own id
    — the reference's new-record path.

    Both frames need (id_col, source_col, order_col, alias_col,
    scalar_cols, array_cols). Two alias-joins + one grouped merge; no
    driver-side loops, no cross join.

    Intra-batch overlap: the reference processes records sequentially, so
    INCOMING records sharing aliases — including CHAINS (A~B, B~C with no
    A~C alias) — all merge into one stored record. Set-based restatement:
    ``alias_components`` computes the TRANSITIVE closure of the intra-batch
    alias graph via iterative label propagation (converges in diameter
    iterations, bounded by ``max_closure_iters``); each component's leader
    — its best record by (priority, newest, id) — canonicalizes the group,
    and the group's best existing match (if any, picked by the same total
    order) keys the whole component.

    ``precomputed_match``: an ``alias_overlap_match(incoming, existing,
    with_order=True)`` result the caller already has (the ingest pipeline
    computes one to prefilter the store) — passing it avoids a second
    execution of the alias-explode join. It may have been computed against
    a SUPERSET of ``existing`` (pre-filter), since every matched id must
    survive the caller's restriction by construction.
    """
    array_cols = array_cols or []
    m_ex = precomputed_match
    if m_ex is None:
        m_ex = alias_overlap_match(
            incoming, existing, id_col, alias_col, source_col, order_col,
            with_order=True,
        )
    m_self = alias_components(
        incoming, id_col, alias_col, source_col, order_col,
        max_iters=max_closure_iters,
    ).withColumnRenamed(id_col, "incoming_id")
    inc0 = incoming.join(
        m_self, incoming[id_col] == m_self["incoming_id"], "left"
    ).withColumn("_leader", F.coalesce("_leader", F.col(id_col)))
    # the component's best existing match keys the whole group; tiebreak
    # (priority, newest, id) — identical to alias_overlap_match's window
    grp_ex = (
        inc0.select(F.col(id_col).alias("incoming_id"), "_leader")
        .join(m_ex, "incoming_id")
        .groupBy("_leader")
        .agg(
            F.min(
                F.struct(
                    source_priority_col("matched_source").alias("_p"),
                    (-F.col("matched_ord")).alias("_no"),
                    F.col("matched_id").alias("_id"),
                )
            )["_id"].alias("_grp_ex")
        )
    )
    inc_keyed = (
        inc0.join(grp_ex, "_leader", "left")
        .withColumn("_mk", F.coalesce("_grp_ex", "_leader"))
        .drop("incoming_id", "_leader", "_grp_ex")
    )
    ex_keyed = existing.withColumn("_mk", F.col(id_col))
    keep = ["_mk", source_col, order_col, *scalar_cols, *array_cols]
    if tiebreak_col is not None:
        keep.append(tiebreak_col)
    both = inc_keyed.select(*keep).unionByName(ex_keyed.select(*keep))
    merged = fold_merge(
        both,
        ["_mk"],
        scalar_cols,
        array_cols,
        source_col,
        order_col,
        tiebreak_col=tiebreak_col,
        with_source_ords=with_source_ords,
    )
    return merged.withColumnRenamed("_mk", id_col)


def richness_merge(
    existing_details: Column, new_details: Column, existing_ts: Column, new_ts: Column
) -> list[Column]:
    """M5 alternate merge (normalizer.go:375-428): keep the longer text and
    the most recent timestamp."""
    details = F.when(
        F.length(F.coalesce(new_details, F.lit(""))) > F.length(
            F.coalesce(existing_details, F.lit(""))
        ),
        new_details,
    ).otherwise(existing_details)
    return [details.alias("details"), F.greatest(existing_ts, new_ts).alias("ts")]
