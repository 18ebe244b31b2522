"""Device-mesh helpers for particle-axis data parallelism.

The problem's natural axes are particles N (large, shardable), mixture
components K (small) and dimension D (small); the only parallelism that
matters is sharding N over all chips (ICI within a slice, DCN across hosts --
both handled transparently by XLA collectives).  See SURVEY.md section 2
("Parallelism strategies") for why there is no tensor/pipeline analog here.
"""

import numpy as _np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["particle_mesh", "particle_sharding", "replicated_sharding",
           "distributed_initialize", "PARTICLE_AXIS"]

PARTICLE_AXIS = "particles"


def particle_mesh(devices=None, axis_name: str = PARTICLE_AXIS) -> Mesh:
    """Build a 1-D mesh over ``devices`` (default: all devices, including
    all hosts' devices in a multi-host ``jax.distributed`` setup) with a
    single particle axis."""
    if devices is None:
        devices = jax.devices()
    return Mesh(_np.asarray(devices), (axis_name,))


def particle_sharding(mesh: Mesh, axis_name: str = PARTICLE_AXIS) -> NamedSharding:
    """Sharding that splits the leading (particle) axis over the mesh."""
    return NamedSharding(mesh, P(axis_name))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    """Fully replicated sharding (mixture parameters, scalars)."""
    return NamedSharding(mesh, P())


def distributed_initialize(coordinator_address=None, num_processes=None,
                           process_id=None, **kwargs):
    """Initialize the multi-host JAX runtime (replaces the reference's
    ``mpirun`` + mpi4py startup).  All arguments are forwarded to
    ``jax.distributed.initialize``; with none given, cluster-environment
    auto-detection is used."""
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        **kwargs,
    )
    # re-evaluate the logging setup now that the process topology is known
    # (only process 0 logs below ERROR)
    from ..tools.util import log_to_stdout

    log_to_stdout()
