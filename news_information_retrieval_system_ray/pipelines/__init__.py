"""End-to-end pipelines: index build, query engine, dedup, analytics."""
