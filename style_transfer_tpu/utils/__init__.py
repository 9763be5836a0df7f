"""Image IO, progress/observability, checkpointing, profiling utilities."""
