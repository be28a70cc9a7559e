from .weekly_summary import (
    weekly_rental_summary,
    weekly_rental_summary_sql,
    oracle_weekly_summary_sql,
)

__all__ = [
    "weekly_rental_summary",
    "weekly_rental_summary_sql",
    "oracle_weekly_summary_sql",
]
