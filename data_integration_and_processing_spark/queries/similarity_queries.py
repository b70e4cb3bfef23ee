"""similarity_queries queries (filled in incrementally)."""
