"""Multi-device SPMD sharding (domain decomposition over a jax Mesh)."""

from .sharding import context_specs, facet_specs, pad_cell_array, shard_problem

__all__ = ["context_specs", "facet_specs", "pad_cell_array", "shard_problem"]
