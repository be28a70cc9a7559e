"""Named warehouse-scale operators (post-parity extensions over the TPC-H-ish
fixture tables). Parity operators live in queries.py/plans/; these demonstrate
the fact-table patterns (star joins, skew-safe aggregation) at engine level."""
