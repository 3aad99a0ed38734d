from .advisory_ingest import (  # noqa: F401
    CANON_ARRAYS,
    CANON_SCALARS,
    create_vuln_table,
    gitlab_advisories_to_vulns,
    ingest_advisories,
    to_canonical,
)
