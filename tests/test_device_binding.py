"""Engine processes bind to their assigned device slot (core.platform.
bind_device; reference mechanism: cudaSetDevice, main.cpp:264)."""

import json
import os
import subprocess
import sys

import jax

from apde_mvs_tpu.core.platform import bind_device

_CHILD = r"""
import json, sys
import jax
jax.config.update("jax_platforms", "cpu")
from apde_mvs_tpu.core.platform import bind_device
idx = int(sys.argv[1])
bind_device(idx)
x = jax.numpy.zeros((4,)) + idx
print(json.dumps({"slot": idx, "device": x.devices().pop().id,
                  "n": len(jax.local_devices())}))
"""


def test_bind_device_places_computation():
    n = len(jax.local_devices())
    assert n == 8
    try:
        for idx in (0, 3, 7, 9):  # 9 wraps to 1
            bind_device(idx)
            x = jax.numpy.ones((4,))
            assert x.devices().pop().id == idx % n
    finally:
        bind_device(0)


def test_worker_processes_land_on_disjoint_devices(tmp_path):
    """N spawned engine processes with distinct --gpu_index slots use N
    distinct devices (the scheduler's device_num x work_num contract)."""
    env = dict(os.environ)
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env["JAX_PLATFORMS"] = "cpu"
    results = []
    procs = [subprocess.Popen([sys.executable, "-c", _CHILD, str(i)],
                              env=env, stdout=subprocess.PIPE, text=True)
             for i in range(3)]
    for p in procs:
        out, _ = p.communicate(timeout=120)
        assert p.returncode == 0
        results.append(json.loads(out.strip().splitlines()[-1]))
    assert all(r["n"] == 4 for r in results)
    assert sorted(r["device"] for r in results) == [0, 1, 2]
