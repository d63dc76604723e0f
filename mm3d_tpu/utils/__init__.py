"""L4 utilities: metrics, checkpointing, logging, profiling."""
