"""streaming_queries queries (filled in incrementally)."""
