"""Composed operators beyond the reference's surface: deduplication,
similarity search, as-of joins, text analysis, multimodal plumbing.
Library API -- each takes/returns DataFrames; the registered queries in
queries/ are thin wrappers over these."""
