"""Sources: raw JSON zone reader/flattener, parquet fact reader, adapters."""
