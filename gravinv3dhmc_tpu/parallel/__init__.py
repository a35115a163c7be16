"""Multi-chip distribution: sharded kernel matvec + chain parallelism."""
from . import multihost
from .sharded import (carry_shardings, make_mesh, make_sharded_chunk_sampler,
                      make_sharded_potential, welford_metric_switch)

__all__ = ["make_mesh", "make_sharded_potential",
           "make_sharded_chunk_sampler", "carry_shardings",
           "welford_metric_switch", "multihost"]
