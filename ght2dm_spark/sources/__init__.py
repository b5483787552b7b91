"""Input sources beyond plain parquet (SURVEY §2.1)."""
