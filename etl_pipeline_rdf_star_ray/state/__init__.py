"""Durable state: lake-table metadata, checkpoint manifest, exactly-once
Parquet sink, snapshot/point-in-time reads."""
