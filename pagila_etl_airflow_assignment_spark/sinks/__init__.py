from .bucketing import cobucketed_join, write_bucketed
from .maintenance import clustered_write, compact_table, table_file_stats

__all__ = [
    "clustered_write",
    "cobucketed_join",
    "compact_table",
    "table_file_stats",
    "write_bucketed",
]
