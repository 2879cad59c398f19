from ovalspark.sources.snapshots import (  # noqa: F401
    ConcurrentCommitError,
    current_snapshot_id,
    load_manifest,
    reconcile_counts,
    snapshot_files,
    snapshot_history,
    snapshot_read,
    snapshot_write,
    vacuum,
)
from ovalspark.sources.tables import (  # noqa: F401
    CATALOG_DDL,
    DOCS_DDL,
    TableSet,
    read_table,
    register_bucketed,
    write_bucketed,
    write_table,
)
