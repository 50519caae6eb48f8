"""Pure-Python core: deterministic data generation, URL/HTML/robots semantics,
the toy image codec, and the reference-semantics oracle simulator.

Everything here is importable on executors (no SparkSession needed) so the same
functions back both the driver-side oracle and the vectorized pandas UDFs.
"""
