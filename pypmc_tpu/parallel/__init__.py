"""Multi-device / multi-host scaling over the particle axis.

Replaces the reference's MPI layer (``pypmc/tools/parallel_sampler.py``) with
``jax.sharding.Mesh`` + ``shard_map`` + ``psum`` collectives: the particle
axis is sharded over all chips, mixture parameters are replicated, and the
PMC/VB sufficient statistics are all-reduced (O(K D^2) communication instead
of the reference's O(N D) gather-to-rank-0).
"""

from .mesh import particle_mesh, distributed_initialize
from .sampler import ParallelSampler, run_is_step_sharded, pmc_run_sharded
