"""Two-process ``jax.distributed`` test -- the analog of the reference's
``mpirun -n 2`` re-run pattern (``Makefile:101-104``): the sharded PMC
update must produce the identical mixture on every process, matching the
single-process result on the same global particle set."""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

_WORKER = r"""
import os, sys
import numpy as np

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"

import jax

jax.distributed.initialize(
    coordinator_address=sys.argv[1],
    num_processes=2,
    process_id=int(sys.argv[2]),
)
jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp
from functools import partial
from jax.sharding import PartitionSpec as P

from pypmc_tpu.density import core
from pypmc_tpu.mix_adapt.pmc import pmc_update
from pypmc_tpu.parallel import particle_mesh

assert len(jax.devices()) == 4  # 2 processes x 2 local devices

MEANS = np.array([[1.0, -1.0], [2.0, 3.0]])
COVS = np.array([[[1.3, 0.7], [0.7, 1.5]], [[0.5, 0.0], [0.0, 0.5]]])
params, _ = core.make_mixture(MEANS, COVS, np.array([0.5, 0.5]))

n = 4 * 100
rng = np.random.default_rng(0)
samples = rng.normal(size=(n, 2))
weights = np.abs(rng.normal(1.0, 0.2, size=n))

# single-device reference result (replicated computation)
serial = pmc_update(params, jnp.asarray(samples), jnp.asarray(weights))

mesh = particle_mesh()

@partial(jax.shard_map, mesh=mesh, in_specs=(P(), P("particles"), P("particles")),
         out_specs=P())
def sharded(params, s, w):
    return pmc_update(params, s, w, axis_name="particles").params

# distribute the global arrays: each process provides its local shard
from jax.sharding import NamedSharding
sharding = NamedSharding(mesh, P("particles"))
s_global = jax.make_array_from_process_local_data(sharding, samples)
w_global = jax.make_array_from_process_local_data(sharding, weights)

out = jax.jit(sharded)(params, s_global, w_global)

ok = (
    np.allclose(np.asarray(serial.params.weights), np.asarray(out.weights), atol=1e-12)
    and np.allclose(np.asarray(serial.params.means), np.asarray(out.means), atol=1e-12)
    and np.allclose(np.asarray(serial.params.cov), np.asarray(out.cov), atol=1e-12)
)
print("RESULT", int(os.environ.get("PROC_ID", sys.argv[2])), "OK" if ok else "MISMATCH",
      flush=True)
sys.exit(0 if ok else 1)
"""


@pytest.mark.slow
def test_two_process_distributed_pmc(tmp_path):
    port = None
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coord = "127.0.0.1:%d" % port

    worker_file = tmp_path / "worker.py"
    worker_file.write_text(_WORKER)

    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)
    env.pop("XLA_FLAGS", None)
    env["PYTHONPATH"] = os.getcwd() + os.pathsep + env.get("PYTHONPATH", "")

    procs = [
        subprocess.Popen(
            [sys.executable, str(worker_file), coord, str(i)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for i in range(2)
    ]
    outputs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=180)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
        outputs.append(out)

    for i, (p, out) in enumerate(zip(procs, outputs)):
        assert p.returncode == 0, "process %d failed:\n%s" % (i, out[-2000:])
        assert "OK" in out
