from .maintenance import clustered_write, compact_table, table_file_stats

__all__ = ["clustered_write", "compact_table", "table_file_stats"]
