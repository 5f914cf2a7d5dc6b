"""Multi-chip sharding: mesh helpers, halo-exchange framing, streaming
reductions (populated incrementally)."""
