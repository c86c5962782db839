"""Sources: parquet readers + deterministic synthetic corpus generators."""
