from .readers import TABLES, read_table, register_views  # noqa: F401
from .writers import merge_upsert, write_partitioned  # noqa: F401
