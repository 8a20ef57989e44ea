"""North-star queries (filled in operators/dedup|similarity|text)."""
