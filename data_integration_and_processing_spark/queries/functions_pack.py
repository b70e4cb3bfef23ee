"""functions_pack queries (filled in incrementally)."""
