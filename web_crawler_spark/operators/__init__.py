"""Composed DataFrame operators: payload validation, dedup suite, similarity search, exports."""
