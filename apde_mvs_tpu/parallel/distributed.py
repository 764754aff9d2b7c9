"""Multi-host orchestration: process initialization and scan partitioning.

The reference's scale-out is `gpu_num x work_num` process slots on one
machine (run.py:218-226). On a TPU pod slice the analogue is one process per
host: `initialize()` brings up `jax.distributed`, and `partition_scans`
assigns scans to hosts with the same LPT (largest-first) balancing the
reference applies to its slot queue (run.py:213-215). Within a host, a
scan's views shard over the local chips via `parallel.mesh`.

`throughput_report` measures scans/hour and scaling efficiency, the
BASELINE.md fleet metrics.
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict, List, Optional, Sequence, Tuple


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> Tuple[int, int]:
    """Initialize jax.distributed when running multi-host; no-op for a single
    process. Returns (process_index, process_count)."""
    import jax

    address = coordinator_address or os.environ.get("COORDINATOR_ADDRESS") \
        or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if address:
        jax.distributed.initialize(
            coordinator_address=address,
            num_processes=num_processes, process_id=process_id)
    return jax.process_index(), jax.process_count()


def partition_scans(scans: Sequence[Tuple[str, int]], num_hosts: int,
                    host_index: int) -> List[str]:
    """LPT partition of (scan, image_count) jobs over hosts: sort by size
    descending, greedily assign each scan to the least-loaded host; return
    this host's share (deterministic across hosts)."""
    order = sorted(scans, key=lambda e: (-e[1], e[0]))
    loads = [0] * num_hosts
    mine: List[str] = []
    for scan, weight in order:
        h = loads.index(min(loads))
        loads[h] += max(weight, 1)
        if h == host_index:
            mine.append(scan)
    return mine


def throughput_report(scan_times_s: Dict[str, float], num_hosts: int,
                      single_host_baseline_s: Optional[float] = None) -> dict:
    """Scans/hour + scaling efficiency vs a single-host baseline.

    Wall clock for multi-host runs is estimated by LPT-assigning the scan
    times over hosts (the same greedy `partition_scans` uses) and taking the
    busiest host's total — `max(scan_times)` alone would underestimate the
    wall whenever a host runs more than one scan.
    """
    total = sum(scan_times_s.values())
    if num_hosts > 1 and scan_times_s:
        loads = [0.0] * num_hosts
        for t in sorted(scan_times_s.values(), reverse=True):
            loads[loads.index(min(loads))] += t
        wall = max(loads)
    else:
        wall = total
    scans_per_hour = len(scan_times_s) / max(wall, 1e-9) * 3600
    report = {
        "num_scans": len(scan_times_s),
        "num_hosts": num_hosts,
        "wall_clock_s": wall,
        "scans_per_hour": scans_per_hour,
    }
    if single_host_baseline_s:
        ideal = single_host_baseline_s / num_hosts
        report["scaling_efficiency"] = ideal / max(wall, 1e-9)
    return report
