"""Ray Data pipelines: the CDC ingest loop and its stages."""
