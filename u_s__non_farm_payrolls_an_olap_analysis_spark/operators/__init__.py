"""Operator pack: every SURVEY.md §2 inventory row as a pure
``(spark, sf_dir) -> DataFrame`` function with a DuckDB-oracle twin."""
