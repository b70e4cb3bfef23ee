"""dedup_queries queries (filled in incrementally)."""
