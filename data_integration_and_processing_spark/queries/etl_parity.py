"""etl_parity queries (filled in incrementally)."""
