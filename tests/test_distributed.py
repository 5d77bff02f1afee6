"""Multi-process (multi-"host") runtime: 2 CPU processes, one coordinator,
a global 8-device mesh, and a cross-process collective — the SURVEY §5.8
"jax.distributed initialization per host" row, exercised for real.

Each subprocess gets 4 virtual CPU devices (xla_force_host_platform_
device_count), initializes jax.distributed against a shared coordinator,
builds the global z-mesh via parallel.distributed, and runs a sharded
computation whose result requires a cross-process psum.  Runs entirely on
CPU — no pod needed (SURVEY §4 test-strategy row d).
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import os, sys
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")

from psgradientsdf_tpu.parallel import distributed

addr, nproc, pid = sys.argv[1], int(sys.argv[2]), int(sys.argv[3])
distributed.initialize(coordinator_address=addr, num_processes=nproc,
                       process_id=pid)
info = distributed.process_info()
assert info["process_count"] == nproc, info
assert info["global_devices"] == 4 * nproc, info

import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P
from psgradientsdf_tpu.parallel.distributed import make_global_mesh, host_local_slice

mesh = make_global_mesh(n_z=0, n_frames=1)
assert mesh.shape["z"] == 4 * nproc, mesh.shape

# global array sharded over z: each process contributes its local rows
Z = 16
rows_here = host_local_slice(Z, mesh)
local = np.arange(Z, dtype=np.float32)[rows_here]
arr = jax.make_array_from_process_local_data(
    NamedSharding(mesh, P("z")), local, (Z,))

# cross-process reduction: sum of 0..15 == 120
total = jax.jit(lambda x: jnp.sum(x))(arr)
val = float(total)
assert abs(val - 120.0) < 1e-6, val

# a shard_map psum across the global mesh
from jax import shard_map
def body(x):
    return jax.lax.psum(jnp.sum(x), "z")
f = jax.jit(shard_map(body, mesh=mesh, in_specs=(P("z"),), out_specs=P()))
val2 = float(f(arr))
assert abs(val2 - 120.0) < 1e-6, val2

print(f"WORKER_OK pid={pid} devices={info['global_devices']} sum={val}")
"""


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_distributed_mesh(tmp_path):
    port = _free_port()
    addr = f"127.0.0.1:{port}"
    nproc = 2
    env = dict(os.environ, PALLAS_AXON_POOL_IPS="", JAX_PLATFORMS="cpu",
               PYTHONPATH=ROOT)
    env.pop("XLA_FLAGS", None)
    script = str(tmp_path / "worker.py")
    with open(script, "w") as fh:
        fh.write(WORKER)
    procs = [
        subprocess.Popen(
            [sys.executable, script, addr, str(nproc), str(i)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE,
            text=True)
        for i in range(nproc)
    ]
    outs = []
    try:
        for p in procs:
            out, err = p.communicate(timeout=240)
            outs.append((p.returncode, out, err))
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for rc, out, err in outs:
        assert rc == 0, f"rc={rc}\nstdout:\n{out}\nstderr:\n{err[-3000:]}"
        assert "WORKER_OK" in out, out
