"""IO layer: parquet table helpers + the IcebergLite table format."""
