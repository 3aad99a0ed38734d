"""vuln_datasync_spark — a from-scratch PySpark-native CDC / incremental-ingest engine.

Re-expresses the capabilities of the reference system (vchan-in/vuln-datasync,
a Go pull-normalize-upsert loop over PostgreSQL) as an idiomatic Spark
pipeline:

    changelog (insert/update/delete events keyed by (repo, path))
        -> vectorized normalization (built-in exprs + Arrow pandas UDFs)
        -> salted two-phase last-writer-wins resolution per key
        -> MERGE into a snapshot-isolated keyed table (mini-Iceberg parquet
           sink with atomic manifest commits; real Iceberg behind import-try)
        -> per-micro-batch lineage records, exactly-once via epoch-tagged
           commits + monotone commit_seq merge conditions.

Layout:
    datagen/    deterministic synthetic changelog + single-threaded oracle
    functions/  scalar/vectorized column functions (hashing, normalize, text)
    operators/  LWW resolve, merge resolution, dedup, similarity, multimodal
    sinks/      keyed MERGE sinks (manifest parquet, Iceberg), exports
    sources/    changelog batch/stream sources
    streaming/  Structured Streaming pipeline + lineage
    plans/      query catalog (Spark impl + DuckDB oracle SQL pairs)
"""

__version__ = "0.1.0"
