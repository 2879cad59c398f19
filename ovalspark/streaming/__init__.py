from ovalspark.streaming.validate_stream import (  # noqa: F401
    monotonic_generation_stream,
    validate_stream,
)
