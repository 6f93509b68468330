"""Input sources: synthetic pages tables and parquet readers."""
