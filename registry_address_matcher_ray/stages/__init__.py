"""Dataset -> Dataset operators (blocking, matching, clustering, dedup, analytics)."""
