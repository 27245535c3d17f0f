from .scalars import (  # noqa: F401
    bucket_key,
    date_partition,
    norm_round,
    safe_high_precision,
)
