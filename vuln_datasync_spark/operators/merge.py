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

from pyspark.sql import Column, DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from ..functions.hashing import sanitize_aliases

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

    One aggregation: rank rows per key by (priority, -order), keep ranks
    1-2 via min_by-style structs, then field-wise coalesce.
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
    agg = df.groupBy(*key_cols).agg(
        F.min(rank_struct).alias("w1"),
        # F.get: null (not ANSI error) when the key has a single source
        F.get(F.sort_array(F.collect_list(rank_struct)), 1).alias("w2"),
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


def alias_overlap_match(
    incoming: DataFrame,
    existing: DataFrame,
    id_col: str = "vuln_id",
    alias_col: str = "aliases",
    source_col: str = "source",
    order_col: str = "commit_seq",
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
    path).
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
    return (
        j.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select("incoming_id", "matched_id", "matched_source")
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
    two INCOMING records sharing an alias merge via the stored copy of
    whichever landed first. Set-based restatement: a self alias-match
    first canonicalizes each incoming record to its best-priority alias
    mate (one-hop group leader), and the group's best existing match (if
    any) keys the whole group. Alias CHAINS beyond one hop (A~B~C with no
    A~C alias) still split — full transitive closure needs an iterative
    connected-components pass, which the reference only achieves by
    strictly serial inserts.
    """
    array_cols = array_cols or []
    m_ex = alias_overlap_match(
        incoming, existing, id_col, alias_col, source_col, order_col
    )
    m_self = alias_overlap_match(
        incoming, incoming, id_col, alias_col, source_col, order_col
    ).select(
        F.col("incoming_id"), F.col("matched_id").alias("_leader")
    )
    inc0 = incoming.join(
        m_self, incoming[id_col] == m_self["incoming_id"], "left"
    ).withColumn("_leader", F.coalesce("_leader", F.col(id_col)))
    # the one-hop group's best existing match keys the whole group
    grp_ex = (
        inc0.select(F.col(id_col).alias("incoming_id"), "_leader")
        .join(m_ex, "incoming_id")
        .groupBy("_leader")
        .agg(
            F.min(
                F.struct(
                    source_priority_col("matched_source").alias("_p"),
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
    both = inc_keyed.select(*keep).unionByName(ex_keyed.select(*keep))
    merged = priority_merge(
        both, ["_mk"], scalar_cols, array_cols, source_col, order_col
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
