"""Two-process jax.distributed dry run on CPU: the DCN story beyond a
docstring (VERDICT round-1 item 10). Each spawned process initializes the
distributed runtime, builds a global 2-device mesh, and runs a psum +
jnp-based sharded step; scan partitioning must be consistent across ranks."""

import json
import os
import socket
import subprocess
import sys

import pytest

_CHILD = r"""
import json, sys
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from apde_mvs_tpu.parallel.distributed import initialize, partition_scans

addr, rank = sys.argv[1], int(sys.argv[2])
pid, count = initialize(coordinator_address=addr, num_processes=2,
                        process_id=rank)
assert (pid, count) == (rank, 2), (pid, count)
devices = jax.devices()
assert len(devices) == 2, devices

mesh = Mesh(np.asarray(devices), ("hosts",))
try:
    from jax import shard_map
except ImportError:
    from jax.experimental.shard_map import shard_map


def step(x):
    # one value per process; DCN-analog collective across them
    total = jax.lax.psum(x, "hosts")
    return x + total


mapped = jax.jit(shard_map(step, mesh=mesh, in_specs=(P("hosts"),),
                           out_specs=P("hosts"), check_vma=False))
import jax.experimental.multihost_utils as mh
local = jnp.asarray([float(rank + 1)])
garr = mh.host_local_array_to_global_array(local, mesh, P("hosts"))
out = mapped(garr)
local_out = mh.global_array_to_host_local_array(out, mesh, P("hosts"))
# total = 1 + 2 = 3; rank r holds (r+1) + 3
assert float(np.asarray(local_out)[0]) == rank + 1 + 3.0

scans = [("a", 10), ("b", 8), ("c", 5), ("d", 2)]
mine = partition_scans(scans, 2, rank)
print(json.dumps({"rank": rank, "scans": mine}))
"""


@pytest.mark.slow
def test_two_process_distributed_step(tmp_path):
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    addr = f"127.0.0.1:{port}"
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)
    procs = [subprocess.Popen(
        [sys.executable, "-c", _CHILD, addr, str(r)], env=env,
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True)
        for r in range(2)]
    results = {}
    for p in procs:
        out, err = p.communicate(timeout=300)
        assert p.returncode == 0, f"rank failed:\n{err[-2000:]}"
        rec = json.loads(out.strip().splitlines()[-1])
        results[rec["rank"]] = rec["scans"]
    # LPT split is deterministic and disjoint across ranks
    assert set(results[0]) | set(results[1]) == {"a", "b", "c", "d"}
    assert not set(results[0]) & set(results[1])
    assert results[0] == ["a", "d"] and results[1] == ["b", "c"]
