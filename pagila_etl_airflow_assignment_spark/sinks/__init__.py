from .bucketing import cobucketed_join, write_bucketed
from .maintenance import clustered_write, compact_table, table_file_stats
from .zorder import with_zorder_key, zordered_write

__all__ = [
    "clustered_write",
    "cobucketed_join",
    "compact_table",
    "table_file_stats",
    "with_zorder_key",
    "write_bucketed",
    "zordered_write",
]
