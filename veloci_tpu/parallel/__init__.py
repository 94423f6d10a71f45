"""Multi-chip sharding: document-sharded postings over a `jax.sharding.Mesh`."""
