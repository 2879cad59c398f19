from ovalspark.streaming.validate_stream import (  # noqa: F401
    dedup_stream,
    monotonic_generation_stream,
    validate_stream,
    windowed_distribution_drift,
    windowed_violation_counts,
)
