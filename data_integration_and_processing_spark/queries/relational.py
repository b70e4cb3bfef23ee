"""relational queries (filled in incrementally)."""
