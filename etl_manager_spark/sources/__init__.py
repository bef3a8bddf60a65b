"""Sources/sinks: per-format Spark readers and writers."""
