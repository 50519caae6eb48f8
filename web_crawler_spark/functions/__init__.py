"""Vectorized functions: pandas/Arrow UDFs and probabilistic membership filters."""
