from ovalspark.sources.snapshots import (  # noqa: F401
    ConcurrentCommitError,
    SchemaMismatchError,
    adopt_catalog_pointer,
    commit_staged_files,
    current_snapshot_id,
    expire_snapshots,
    load_manifest,
    manifest_column_stats,
    manifest_diff,
    merge_segments,
    prune_files,
    read_expected_docs,
    reconcile_counts,
    snapshot_compact,
    snapshot_delete,
    snapshot_files,
    snapshot_history,
    snapshot_read,
    snapshot_write,
    vacuum,
)
from ovalspark.sources.commit_guard import (  # noqa: F401
    CommitGuard,
    DirLockGuard,
    FlockGuard,
    SqliteCatalogGuard,
    register_guard,
    resolve_guard,
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
from ovalspark.sources.stream_source import (  # noqa: F401
    FORMAT_NAME,
    SnapshotDataSource,
    register_snapshot_source,
)
