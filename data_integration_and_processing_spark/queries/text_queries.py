"""text_queries queries (filled in incrementally)."""
