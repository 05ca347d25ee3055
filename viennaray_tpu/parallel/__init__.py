"""Multi-chip / multi-host sharded tracing."""
