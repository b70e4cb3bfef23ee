"""multimodal_queries queries (filled in incrementally)."""
