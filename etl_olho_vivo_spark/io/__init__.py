"""I/O layer: raw-zone JSON source, flatten, and Parquet/CSV sinks."""
