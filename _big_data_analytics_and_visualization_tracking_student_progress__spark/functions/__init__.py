from .scalar import (  # noqa: F401
    composite_key,
    dsum,
    grade_bucket_4pt,
    lenient_double,
    row_hash,
    status_case,
    wavg,
)
