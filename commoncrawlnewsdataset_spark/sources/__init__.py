"""Sources & sinks: WARC ingestion, partitioned pages table, dimension loads."""
