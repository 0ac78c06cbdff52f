from .relational import broadcast_lookup, anti_join, semi_join  # noqa: F401
from .windows import latest_by_key, top_k  # noqa: F401
from .cdc import diff_snapshots, with_row_hash  # noqa: F401
from .upsert import merge_by_key  # noqa: F401
