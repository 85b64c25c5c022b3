# stage checkpointing, per-partition lineage, and run metrics
