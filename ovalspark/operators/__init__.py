from ovalspark.operators.spans import VIOLATION_SCHEMA, validate_spans  # noqa: F401
from ovalspark.operators.existence import check_existence  # noqa: F401
from ovalspark.operators.counts import check_partition_counts  # noqa: F401
from ovalspark.operators.uniqueness import check_uniqueness  # noqa: F401
from ovalspark.operators.stats import column_profile  # noqa: F401
from ovalspark.operators.referential import check_referential  # noqa: F401
from ovalspark.operators.incremental import (  # noqa: F401
    iter_commit_batches,
    iter_committed_snapshots,
    stored_catalog_for,
    validate_delete,
    validate_replace,
    validate_snapshot_delta,
    validate_upsert,
    validate_snapshot_tail,
    validate_snapshot_tail_checkpointed,
)
from ovalspark.operators.drift import ks_drift, chi_square_drift  # noqa: F401
