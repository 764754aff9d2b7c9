"""Per-view PatchMatch engine — the device-side orchestration of one pass
(reference: APD::RunPatchMatch, APD.cu:2663-2737).

Host-level structure of one pass:

1.  [APD] nearest-strong transform -> anchor generation over the compacted
    weak list -> demote anchorless weak pixels (one jitted stage)
2.  initialization (random planes or loaded depth/normal) + initial cost and
    top-k view selection
3.  max_iterations x { strong sweep (black, red); [APD] fit-plane RANSAC +
    fused weak sweep } — a single jitted core
4.  plane -> (world normal, depth); strong median filter (black, red)
5.  reliability reclassification (DepthToWeak), chunked over pixels
6.  [geom|APD] confidence; local refine, chunked

Jitted stages are cached per (shape, source count, weak bucket, flag set).
The weak-pixel list is compacted on the host once per pass (the weak set is
fixed during a pass's iterations, as in the reference) and padded to bucketed
sizes to bound recompilation.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import ANCHOR_NUM, STRONG, UNKNOWN, WEAK, PatchMatchParams
from ..core import geometry as geo
from ..ops import anchors as anchor_ops
from ..ops import filters, init as init_ops
from ..ops.cost import CostData
from ..ops.propagation import PropCfg, _throttle, propagate_strong, \
    propagate_strong_host, propagate_weak, propagate_weak_host
from ..ops.state import PMState


class StaticCfg(NamedTuple):
    """Hashable jit-static configuration of a pass."""

    prop: PropCfg
    use_apd: bool
    max_iterations: int
    rotate_time: int


def _bucket(n: int, minimum: int = 4096) -> int:
    """Pad a dynamic count to a growth bucket: 4x below 262144 (the weak
    count differs per view, and every distinct bucket size compiles a fresh
    kernel set — minutes on TPU), 2x above (full-resolution weak lists run
    into millions of pixels; a 4x top bucket wastes more sweep compute than
    an extra compile costs)."""
    b = minimum
    while b < n:
        b *= 4 if b < 262144 else 2
    return b


def pad_to_multiple(arr: np.ndarray, mh: int, mw: int, mode="edge"):
    h, w = arr.shape[:2]
    ph = (-h) % mh
    pw = (-w) % mw
    if ph == 0 and pw == 0:
        return arr
    pad = [(0, ph), (0, pw)] + [(0, 0)] * (arr.ndim - 2)
    return np.pad(arr, pad, mode=mode)


class PatchMatchOutputs(NamedTuple):
    depth: np.ndarray        # (H, W) f32
    normal: np.ndarray       # (H, W, 3) world-frame
    weak: np.ndarray         # (H, W) uint8
    confidence: np.ndarray   # (H, W) uint8
    cost: np.ndarray         # (H, W) f32
    anchors: Optional[np.ndarray]       # (Nw, 9, 2) int32 (APD passes)
    anchors_map: Optional[np.ndarray]   # (H, W) int32
    reliable_curve: Optional[np.ndarray]
    nearest_strong: Optional[np.ndarray] = None   # (H, W, 2) int32 debug
    fit_normal: Optional[np.ndarray] = None       # (Nw, 4) debug


@functools.lru_cache(maxsize=64)
def _jit_apd_setup(shape, num_src, cfg: StaticCfg, nw: int,
                   radius_budget: int):
    def f(data, state, weak_x, weak_y, weak_valid, key, ransac_threshold,
          depth_min, depth_max):
        ns = anchor_ops.nearest_strong_jfa(state.weak, state.confidence,
                                           state.valid)
        res = anchor_ops.gen_anchors(
            key, data, state, weak_x, weak_y, weak_valid, cfg.rotate_time,
            ransac_threshold, depth_min, depth_max, ns,
            radius_budget=radius_budget)
        state = anchor_ops.neighbor_update(state, weak_x, weak_y, weak_valid,
                                           res.reliable)
        return state, res.anchors, res.reliable
    return jax.jit(f)


# gen_anchors' flat probe tensor is (Nw, dirs*radii*jitter) — 2432 columns
# at rotate_time 4 — so the per-program weak chunk stays small
_APD_SETUP_CHUNK = 1 << 15


@functools.lru_cache(maxsize=64)
def _jit_jfa(shape):
    def f(state):
        return anchor_ops.nearest_strong_jfa(state.weak, state.confidence,
                                             state.valid)
    return jax.jit(f)


@functools.lru_cache(maxsize=64)
def _jit_anchor_chunk(shape, num_src, cfg: StaticCfg, chunk: int,
                      radius_budget: int):
    def f(key, data, state, wx, wy, wv, ns, ransac_threshold, depth_min,
          depth_max):
        res = anchor_ops.gen_anchors(
            key, data, state, wx, wy, wv, cfg.rotate_time, ransac_threshold,
            depth_min, depth_max, ns, radius_budget=radius_budget)
        return res.anchors, res.reliable
    return jax.jit(f)


@functools.lru_cache(maxsize=64)
def _jit_neighbor_update(shape):
    def f(state, wx, wy, wv, reliable):
        return anchor_ops.neighbor_update(state, wx, wy, wv, reliable)
    return jax.jit(f, donate_argnums=(0,))


@functools.lru_cache(maxsize=64)
def _jit_init(shape, num_src, cfg: StaticCfg, nw: int, first_init: bool):
    params = PatchMatchParams(
        strong_radius=cfg.prop.strong_radius,
        strong_increment=cfg.prop.strong_increment,
        weak_radius=cfg.prop.weak_radius,
        weak_increment=cfg.prop.weak_increment,
        use_sa=cfg.prop.use_sa, top_k=cfg.prop.top_k)

    def f(data, state, key, depth_min, depth_max, weak_x, weak_y, weak_valid,
          anchors):
        if first_init:
            planes = init_ops.random_planes(key, data, depth_min, depth_max)
        else:
            planes = filters.depth_normal_to_planes(
                data, state.planes[..., 3], state.planes[..., :3])
        state = state.replace(planes=planes)
        h, w = shape
        chunk = (1 << 19) if h * w > (1 << 20) else None
        return init_ops.initial_cost(
            data, state, params, cfg.use_apd and nw > 0,
            weak_x, weak_y, weak_valid, anchors, chunk=chunk)
    return jax.jit(f)


@functools.lru_cache(maxsize=64)
def _jit_iterations(shape, num_src, cfg: StaticCfg, nw: int):
    """The iteration loop as nested lax.scans so every repeated stage (color
    sweeps, iterations) compiles exactly one body — XLA:TPU compile time is
    proportional to the number of distinct NCC bodies, not iterations."""

    def f(data, state, key, weak_x, weak_y, weak_valid, anchors,
          depth_min, depth_max, geom_factor):
        def color_sweep(carry, inp):
            state, it = carry
            color, kc = inp
            state = propagate_strong(data, state, cfg.prop, it, kc, color,
                                     depth_min, depth_max, geom_factor)
            return (state, it), None

        def iter_body(state, inp):
            it, k = inp
            k1, k2, k3 = jax.random.split(k, 3)
            kcs = jax.random.split(k1, 2)
            (state, _), _ = jax.lax.scan(
                color_sweep, (state, it), (jnp.arange(2), kcs))
            if cfg.use_apd and nw > 0:
                fit = anchor_ops.ransac_fit_planes(
                    k2, data, state, weak_x, weak_y, weak_valid, anchors)
                state = propagate_weak(
                    data, state, cfg.prop, it, k3, weak_x, weak_y, weak_valid,
                    anchors, fit, depth_min, depth_max, geom_factor)
            return state, None

        keys = jax.random.split(key, cfg.max_iterations)
        state, _ = jax.lax.scan(
            iter_body, state, (jnp.arange(cfg.max_iterations), keys))
        # plane -> (world normal, depth); median filter both colors in order
        state = state.replace(planes=filters.planes_to_depth_normal(
            data, state.planes))
        state, _ = jax.lax.scan(
            lambda st, color: (filters.median_filter_color(st, color), None),
            state, jnp.arange(2))
        return state
    return jax.jit(f)


# ---------------------------------------------------------------------------
# Host-dispatched pass driver for very large images.
#
# The remote TPU worker kills device programs that execute for longer than
# ~60-80 s (measured: 50 s programs run, ~80 s ones crash the worker —
# benchmarks/sweep_size_probe.py). At ETH3D-native resolution the fused
# iterations program would run for minutes, so above a size threshold the
# pass runs the SAME stage bodies as one program per pixel chunk (~15 s
# each), dispatched from the host. RNG draw grouping differs from the fused
# program (statistically equivalent); the mode is a static function of the
# shapes, so runs remain deterministic.
# ---------------------------------------------------------------------------

# The u8 fast-path edge is a TABLE-BYTE bound: ~405 M rows/s up to
# ~3.5-4.0 MiB of gather-source bytes, ~175 M above, measured to the
# 0.5 MiB and insensitive to row count / coherence / blocking
# (benchmarks/gather_vmem_probe.py, gather_rowcount_probe.py). Budgeting
# uses the LOWER edge so programs near the boundary are estimated slow
# (underestimating runtime risks the remote worker's ~80 s program kill).
_FAST_TABLE_BYTES = 3.5 * (1 << 20)


def _gather_rate(h: int, w: int, u8: bool = True) -> float:
    """Measured row-gather rates for an (h*w, 4) quad table: the u8 fast
    path below the byte edge, the slow path above it; f32 tables have no
    fast path at any size (PERF_NOTES "u8 quads")."""
    if u8 and h * w * 4 <= _FAST_TABLE_BYTES:
        return 380e6
    return 170e6


# Safety threshold against the remote worker's ~80 s hard program-kill
# (PERF_NOTES "three failure modes"); programs estimated above it are
# split / host-dispatched.
_PROGRAM_BUDGET_S = 35.0


# gather-rate drift probe: one measurement per (table shape, dtype) per
# process; results kept for tests / logging
_BUDGET_PROBES = {}


def _verify_gather_budget(data) -> None:
    """Measure the actual row-gather rate of THIS run's table and warn
    loudly when it deviates >25% from the `_gather_rate` constant that all
    chunk budgeting rests on (drift detection: an XLA/driver change that
    shifts the measured 380/170 M rows/s silently invalidates the chunk
    caps and risks the remote worker's ~80 s program kill).

    Methodology per PERF_NOTES/CLAUDE.md: marginal rate across two index
    counts (subtracts dispatch overhead), fresh random indices per call,
    host readback inside the timed region.  ~2 s once per process per
    table configuration; runs only on real accelerators (the constants are
    TPU rates)."""
    key = (tuple(data.src_quads.shape), str(data.src_quads.dtype))
    if key in _BUDGET_PROBES:
        return
    if jax.devices()[0].platform == "cpu":
        return
    import logging
    import time

    from ..core.sampling import take_rows

    table = data.src_quads[0]
    n_rows = int(table.shape[0])
    u8 = table.dtype == jnp.uint8
    expected = _gather_rate(n_rows, 1, u8)

    # indices are generated ON DEVICE: uploading tens of millions of host
    # indices through the remote tunnel dominates the timing and reads as
    # a bogus 20x "drift" (observed: 10 M rows/s on a healthy chip)
    @functools.partial(jax.jit, static_argnames=("n",))
    def g(tab, key, n):
        idx = jax.random.randint(key, (n,), 0, n_rows, dtype=jnp.int32)
        return take_rows(tab, idx).astype(jnp.float32).sum()

    # every call gets a never-repeated key: the axon remote layer memoizes
    # repeated identical (program, inputs) computations (CLAUDE.md), so a
    # measured call reusing a warmup call's key can collapse to ~0 s and
    # read as bogus drift (or mask real drift)
    call_counter = iter(range(1 << 30))

    def timed(n):
        best = float("inf")
        for _ in range(3):
            key = jax.random.PRNGKey(n + 10_000 + next(call_counter))
            t0 = time.perf_counter()
            out = g(table, key, n)
            float(np.asarray(out))          # readback forces completion
            best = min(best, time.perf_counter() - t0)
        return best

    n1, n2 = 16 << 20, 48 << 20
    timed(n1)                               # compile both shapes first
    timed(n2)
    dt = timed(n2) - timed(n1)
    measured = (n2 - n1) / max(dt, 1e-9)
    _BUDGET_PROBES[key] = measured
    ratio = measured / expected
    msg = (f"gather budget probe: table {n_rows} rows "
           f"{'u8' if u8 else 'f32'}: measured {measured / 1e6:.0f} M "
           f"rows/s vs budgeted {expected / 1e6:.0f} (ratio {ratio:.2f})")
    if not 0.75 <= ratio <= 1.33:
        logging.warning(
            "BUDGET DRIFT: %s — the _gather_rate constants in "
            "pipeline/patchmatch.py no longer match this stack; chunk "
            "sizing may overrun the remote worker's program budget "
            "(re-measure with benchmarks/gather_vmem_probe.py)", msg)
    else:
        logging.info(msg)


def _iterations_host_mode(shape, num_src: int, max_iterations: int,
                          u8: bool = True) -> bool:
    """True when the fused iterations program would exceed the remote
    worker's ~60 s execution budget."""
    h, w = shape
    rows = max_iterations * 2 * 14 * (h * w / 2) * num_src * 36
    return rows / _gather_rate(h, w, u8) > _PROGRAM_BUDGET_S


def spmd_stage_seconds(shape, num_src: int, params) -> float:
    """Estimated device seconds of the WORST stage of ONE view's pass in
    the staged SPMD engine (parallel.scene dispatches sweeps / classify /
    finish as separate programs). `run_scan` bounds views-per-device so
    views_per_device * this stays under the worker budget, and falls back
    to the serial host-dispatched engine when a single view exceeds it."""
    h, w = shape
    rate = _gather_rate(h, w, getattr(params, "sampler_u8", True))
    sweep = params.max_iterations * 2 * 14 * (h * w / 2) * num_src * 36
    if params.use_apd and params.state != "first_init":
        # weak sweeps + deformable init rescore + anchor probes on top of
        # the strong sweeps (full-res split measured ~1.5-1.7x)
        sweep *= 1.6
    classify = 61 * h * w * num_src * 36
    refine = 12 * h * w * num_src * 36
    return max(sweep, classify, refine) / rate


def _host_chunks(num_src: int, banded: bool = False) -> Tuple[int, int]:
    """(strong, weak) chunk sizes targeting ~15 s per dispatched program,
    bucketed to powers of two so few chunk-shaped kernels compile.
    APDE_CHUNK_STRONG / APDE_CHUNK_WEAK override for experiments.

    `banded` caps the strong chunk at 2^16: the static-band fast path
    needs the chunk's raster footprint (2C/W image rows for C same-color
    pixels) plus candidate reach and warp spread to fit the BAND_ROWS/W-row
    window — the default 2^18 chunk spans ~173 rows at ETH3D half-res vs
    the 260-row band (0% fit), 2^17 spans ~87 (11% of APD strong chunks
    fit), 2^16 spans ~43 (28% strong / 65% init fit). The full-res A/B
    (PERF_NOTES round 4) measured the 2^16 cap at 2440 s vs 2812 s for
    the same APD pass — more chunks, but more of them ride the band and
    each program is safer against the worker budget."""
    import os
    budget_rows = 2.5e9

    def bucket(target, lo=1 << 14, hi=1 << 19):
        b = lo
        while b * 2 <= min(target, hi):
            b *= 2
        return b

    cs = int(os.environ.get("APDE_CHUNK_STRONG", "0")) \
        or bucket(budget_rows / (14 * num_src * 36))
    if banded:
        cs = min(cs, 1 << 16)
    cw = int(os.environ.get("APDE_CHUNK_WEAK", "0")) \
        or bucket(budget_rows / (15 * num_src * 324))
    return cs, cw


@functools.lru_cache(maxsize=64)
def _jit_make_planes(shape, first_init: bool):
    def f(data, state, key, depth_min, depth_max):
        if first_init:
            return init_ops.random_planes(key, data, depth_min, depth_max)
        return filters.depth_normal_to_planes(
            data, state.planes[..., 3], state.planes[..., :3])
    return jax.jit(f)


@functools.lru_cache(maxsize=64)
def _jit_init_chunk(num_src, cfg: StaticCfg, banded: bool = False):
    params = PatchMatchParams(
        strong_radius=cfg.prop.strong_radius,
        strong_increment=cfg.prop.strong_increment,
        use_sa=cfg.prop.use_sa, top_k=cfg.prop.top_k)

    if banded:
        def f(data, planes_c, x, y, origins):
            return init_ops.initial_cost_chunk(data, planes_c, x, y, params,
                                               origins=origins)
    else:
        def f(data, planes_c, x, y):
            return init_ops.initial_cost_chunk(data, planes_c, x, y, params)
    return jax.jit(f)


@functools.lru_cache(maxsize=64)
def _jit_init_prepass(num_src, cfg: StaticCfg):
    """ONE chunk's bounds per program (scanning programs wedged the remote
    worker; see bands.strong_chunk_bounds)."""
    from ..ops import bands
    ext = bands.sweep_extent(cfg.prop.strong_radius, cfg.prop.use_sa)

    def f(data, x, y, planes_c):
        bb = bands.strong_bounds(data, x, y, planes_c[:, None, :], ext,
                                 union=True)
        return bb.origin, jnp.all(bb.fits)
    return jax.jit(f)


@functools.lru_cache(maxsize=64)
def _jit_weak_rescore_chunk(num_src, cfg: StaticCfg):
    """Deformable initial cost for one weak-pixel chunk (the full-list
    WeakRefData is (Nw, 8, 36) — gigabytes at full-res weak counts)."""
    params = PatchMatchParams(
        strong_radius=cfg.prop.strong_radius,
        strong_increment=cfg.prop.strong_increment,
        weak_radius=cfg.prop.weak_radius,
        weak_increment=cfg.prop.weak_increment,
        use_sa=cfg.prop.use_sa, top_k=cfg.prop.top_k)

    def f(data, state, wx, wy, anchors_c):
        from ..ops.deformable import WeakRefData, ncc_weak
        w = data.width
        wref = WeakRefData.build(
            data, wx.astype(jnp.float32), wy.astype(jnp.float32),
            anchors_c, state.selected, params)
        wplanes = state.planes.reshape(-1, 4)[wy * w + wx]
        return ncc_weak(data, wref, wplanes, params)
    return jax.jit(f)


@functools.lru_cache(maxsize=64)
def _jit_init_commit(shape, num_src, cfg: StaticCfg, with_weak: bool):
    def f(data, state, costs, wcosts, weak_x, weak_y, weak_valid):
        h, w = shape
        if with_weak:
            flat_idx = jnp.where(weak_valid, weak_y * w + weak_x, h * w)
            costs = costs.at[flat_idx].set(wcosts, mode="drop")
        from ..ops.cost import initial_cost_and_selection
        mean_cost, selected = initial_cost_and_selection(
            costs, cfg.prop.top_k)
        return state.replace(
            costs=jnp.where(state.valid, mean_cost.reshape(h, w), 1e9),
            selected=selected.reshape(h, w, -1) & state.valid[..., None])
    # donate the state (fragmentation at full-res; see propagation
    # _strong_commit_jit note)
    return jax.jit(f, donate_argnums=(1,))


@functools.lru_cache(maxsize=64)
def _jit_fit_planes(shape, num_src, cfg: StaticCfg, nw: int):
    def f(key, data, state, weak_x, weak_y, weak_valid, anchors):
        return anchor_ops.ransac_fit_planes(
            key, data, state, weak_x, weak_y, weak_valid, anchors)
    return jax.jit(f)


@functools.lru_cache(maxsize=64)
def _jit_depth_normal_median(shape, num_src):
    def f(data, state):
        state = state.replace(planes=filters.planes_to_depth_normal(
            data, state.planes))
        for color in (0, 1):
            state = filters.median_filter_color(state, color)
        return state
    return jax.jit(f, donate_argnums=(1,))


def _init_host(data, state, key, cfg: StaticCfg, nw_cap, first_init,
               weak_x, weak_y, weak_valid, anchors, depth_min, depth_max,
               chunk):
    # (first_init's random planes measured a 0% band fit rate - skip the
    # pre-pass entirely there)
    """Host-dispatched equivalent of _jit_init: plane init, chunked strong
    initial costs, weak rescore + top-k selection."""
    shape = (data.height, data.width)
    S = data.num_src
    planes = _jit_make_planes(shape, first_init)(
        data, state, key, depth_min, depth_max)
    state = state.replace(planes=planes)
    h, w = shape
    n = h * w
    ys, xs = np.mgrid[0:h, 0:w]
    xf = xs.reshape(-1).astype(np.float32)
    yf = ys.reshape(-1).astype(np.float32)
    pad = (-n) % chunk
    # edge-pad so the band bounds pre-pass covers exactly what the padded
    # lanes gather (outputs beyond n are discarded)
    xf = np.pad(xf, (0, pad), mode="edge")
    yf = np.pad(yf, (0, pad), mode="edge")
    planes_flat = jnp.concatenate(
        [planes.reshape(-1, 4),
         jnp.repeat(planes.reshape(-1, 4)[-1:], pad, axis=0)]) if pad \
        else planes.reshape(-1, 4)
    nc = (n + pad) // chunk
    body = _jit_init_chunk(S, cfg)

    from ..core.sampling import static_bands_enabled
    from ..ops.propagation import BAND_DISPATCH_STATS
    fits_np = None
    if static_bands_enabled(data.src_quads) and not first_init:
        prepass = _jit_init_prepass(S, cfg)
        bbs = []
        for ci in range(nc):
            sl = slice(ci * chunk, (ci + 1) * chunk)
            bbs.append(prepass(data, jnp.asarray(xf[sl]),
                               jnp.asarray(yf[sl]), planes_flat[sl]))
            _throttle(bbs, site="init-prepass")
        fits_np = np.asarray(jnp.stack([b[1] for b in bbs]))
        origins = jnp.stack([b[0] for b in bbs])
        banded_body = _jit_init_chunk(S, cfg, banded=True)
        BAND_DISPATCH_STATS["init"][0] += int(fits_np.sum())
        BAND_DISPATCH_STATS["init"][1] += int(nc - fits_np.sum())

    outs = []
    for ci in range(nc):
        sl = slice(ci * chunk, (ci + 1) * chunk)
        if fits_np is not None and fits_np[ci]:
            outs.append(banded_body(data, planes_flat[sl],
                                    jnp.asarray(xf[sl]), jnp.asarray(yf[sl]),
                                    origins[ci]))
        else:
            outs.append(body(data, planes_flat[sl], jnp.asarray(xf[sl]),
                             jnp.asarray(yf[sl])))
        _throttle(outs, site="init-cost")
    costs = jnp.concatenate(outs, axis=0)[:n]

    use_apd = cfg.use_apd and nw_cap > 0
    wcosts = jnp.zeros((1, S), jnp.float32)
    if use_apd:
        wchunk = min(1 << 16, nw_cap)
        rescore = _jit_weak_rescore_chunk(S, cfg)
        wouts = []
        for ci in range((nw_cap + wchunk - 1) // wchunk):
            sl = slice(ci * wchunk, (ci + 1) * wchunk)
            wouts.append(rescore(data, state, weak_x[sl], weak_y[sl],
                                 anchors[sl]))
            _throttle(wouts, site="apd-rescore")
        wcosts = jnp.concatenate(wouts, axis=0)[:nw_cap]
    return _jit_init_commit(shape, S, cfg, use_apd)(
        data, state, costs, wcosts, weak_x, weak_y, weak_valid)


def _host_sync(tag, state):
    """Completion barrier between host-driver stages: a 1-element readback
    is the only reliable completion barrier through the remote tunnel.

    ALWAYS ON in the host-mode drivers (round-4 wedge root-cause): the
    sweep commits donate the state buffers, and letting the host race
    ahead — enqueueing the next sweep's pre-pass/body burst while a
    donated commit is still queued — reproducibly wedges the remote
    worker mid-pass (r3's two wedges, r4's two: all at sweep boundaries,
    all cleared by this barrier — benchmarks/fullres_stress.py runs,
    PERF_NOTES round 4). One tunnel round-trip (~25 ms) per sweep is
    noise next to a multi-second sweep; it also pins async device
    failures to the stage that raised them. APDE_HOST_SYNC=0 disables
    (wedge experiments only); APDE_HOST_SYNC=1 adds the timing print."""
    import os as _os
    mode = _os.environ.get("APDE_HOST_SYNC", "")
    if mode == "0":
        return
    import time as _time
    from ..ops.propagation import _STALL_WARN_S
    t0 = _time.time()
    np.asarray(state.costs.reshape(-1)[:1])
    dt = _time.time() - t0
    if mode == "1":
        print(f"  [host_sync] {tag}: {dt:.1f} s", flush=True)
    if dt > _STALL_WARN_S:
        print(f"WEDGE WARNING: host_sync {tag} took {dt:.0f}s "
              f"(> {_STALL_WARN_S:.0f}s) — remote worker stall suspected",
              flush=True)


def _iterations_host(data, state, key, cfg: StaticCfg, nw_cap,
                     weak_x, weak_y, weak_valid, anchors,
                     depth_min, depth_max, geom_factor,
                     enable_bands: bool = True):
    """Host-dispatched equivalent of _jit_iterations (same stage order and
    key-split structure as the fused program)."""
    shape = (data.height, data.width)
    S = data.num_src
    from ..core.sampling import static_bands_enabled
    chunk_s, chunk_w = _host_chunks(
        S, banded=enable_bands and static_bands_enabled(data.src_quads))
    keys = jax.random.split(key, cfg.max_iterations)
    for it in range(cfg.max_iterations):
        k1, k2, k3 = jax.random.split(keys[it], 3)
        kcs = jax.random.split(k1, 2)
        for color in (0, 1):
            state = propagate_strong_host(
                data, state, cfg.prop, it, kcs[color], color,
                depth_min, depth_max, geom_factor, chunk=chunk_s,
                enable_bands=enable_bands)
            _host_sync(f"strong it{it} color{color}", state)
        if cfg.use_apd and nw_cap > 0:
            fit = _jit_fit_planes(shape, S, cfg, nw_cap)(
                k2, data, state, weak_x, weak_y, weak_valid, anchors)
            state = propagate_weak_host(
                data, state, cfg.prop, it, k3, weak_x, weak_y, weak_valid,
                anchors, fit, depth_min, depth_max, geom_factor,
                chunk=chunk_w)
            _host_sync(f"weak it{it}", state)
    return _jit_depth_normal_median(shape, S)(data, state)


@functools.lru_cache(maxsize=64)
def _jit_classify(shape, num_src, cfg: StaticCfg, chunk: int,
                  return_curve: bool, sweep_k: int):
    def f(data, state, x, y, weak_peak_radius, geom_factor, depth_min,
          depth_max):
        return filters.depth_to_weak(
            data, state, x, y, weak_peak_radius, cfg.prop.use_sa,
            cfg.prop.geom_consistency, geom_factor, depth_min, depth_max,
            cfg.prop.strong_radius, cfg.prop.strong_increment,
            return_curve=return_curve, sweep_k=sweep_k)
    return jax.jit(f)


@functools.lru_cache(maxsize=64)
def _jit_local_refine(shape, num_src, cfg: StaticCfg, chunk: int,
                      sweep_k: int):
    def f(data, state, x, y, geom_factor, depth_min, depth_max):
        return filters.local_refine(
            data, state, x, y, cfg.prop.use_sa, cfg.prop.geom_consistency,
            geom_factor, depth_min, depth_max,
            cfg.prop.strong_radius, cfg.prop.strong_increment,
            sweep_k=sweep_k)
    return jax.jit(f)


# ---------------------------------------------------------------------------
# View-major classify/refine dispatch (see ops.filters view-major section):
# the host compacts the sweepable (pixel, view) pairs BY VIEW and dispatches
# fixed-size per-view programs that accumulate weighted cost curves into one
# numerator array; a final chunked program normalizes and classifies. Each
# program gathers from ONE per-view quad table with raster-ordered pixels —
# the banded-gather fast path — and only the selected pairs are evaluated.
# ---------------------------------------------------------------------------


@functools.lru_cache(maxsize=64)
def _jit_sweep_view(shape, num_src, cfg: StaticCfg, sb: int, ncols: int,
                    include_now: bool, banded: bool = False):
    num_steps = ncols - int(include_now)

    if banded:
        def f(data, state, acc, x, y, pos, view, geom_factor, origin):
            return filters.sweep_curve_view(
                data, state, acc, x, y, pos, view, cfg.prop.use_sa,
                cfg.prop.geom_consistency, geom_factor,
                cfg.prop.strong_radius, cfg.prop.strong_increment,
                num_steps=num_steps, include_now=include_now, origin=origin)
    else:
        def f(data, state, acc, x, y, pos, view, geom_factor):
            return filters.sweep_curve_view(
                data, state, acc, x, y, pos, view, cfg.prop.use_sa,
                cfg.prop.geom_consistency, geom_factor,
                cfg.prop.strong_radius, cfg.prop.strong_increment,
                num_steps=num_steps, include_now=include_now)
    return jax.jit(f, donate_argnums=(2,))


@functools.lru_cache(maxsize=64)
def _jit_view_sweep_prepass(shape, num_src, cfg: StaticCfg, sb: int,
                            ncols: int, include_now: bool):
    from ..ops import bands
    num_steps = ncols - int(include_now)
    ext = bands.sweep_extent(cfg.prop.strong_radius, cfg.prop.use_sa)

    def f(data, state, xs, ys, view):
        return bands.view_sweep_bounds(data, state, xs, ys, view,
                                       num_steps, include_now, ext)
    return jax.jit(f)


@functools.lru_cache(maxsize=64)
def _jit_classify_finish(shape, num_src, cfg: StaticCfg, chunk: int,
                         return_curve: bool):
    def f(data, state, x, y, num, weak_peak_radius, depth_min, depth_max):
        return filters.classify_from_curve(
            data, state, x, y, num, weak_peak_radius, depth_min, depth_max,
            return_curve=return_curve)
    return jax.jit(f)


@functools.lru_cache(maxsize=64)
def _jit_refine_finish(shape, num_src, cfg: StaticCfg, chunk: int):
    def f(data, state, x, y, num, depth_min, depth_max):
        return filters.refine_from_curve(data, state, x, y, num,
                                         depth_min, depth_max)
    return jax.jit(f)


def _view_major_sb(ncols: int, banded: bool = False) -> int:
    """Per-view program batch, sized for ~1.5 s of fast-path gathers
    (0.6 G rows / ncols / 36 taps, power-of-two); APDE_VIEW_SB overrides.
    `banded` caps the batch at 2^16 so the slice's raster span (batch /
    (W * selection density) rows) fits the static-band window — the 2^18
    default measured a ~50% slice fit rate at ETH3D half-res."""
    import os
    env = int(os.environ.get("APDE_VIEW_SB", "0"))
    if env:
        return env
    target = 0.6e9 / (ncols * 36)
    b = 1 << 14
    while b * 2 <= min(target, 1 << 19):
        b *= 2
    if banded:
        b = min(b, 1 << 16)
    return b


def _use_view_major(data, sel_count_map, mask, sweep_k: int) -> bool:
    """Static chooser for the classify/refine sweeps: view-major pays
    avg-selection fast-rate gathers per pixel-step plus compaction overhead
    (x1.3 margin); the alternative is `_sweep_cost`'s best of K slot gathers
    on the slow flat table (x390/181 per row) or all-S fast-path gathers.
    APDE_VIEW_MAJOR=0/1 overrides."""
    import os
    env = os.environ.get("APDE_VIEW_MAJOR", "")
    if env in ("0", "1"):
        return env == "1"
    if data.src_quads.dtype != jnp.uint8 or not bool(mask.any()):
        return False
    from ..ops.cost import prefer_view_slots
    avg_sel = float(sel_count_map[mask].mean())
    alt = sweep_k * (390.0 / 181.0) if prefer_view_slots(data, sweep_k) \
        else float(data.num_src)
    return avg_sel * 1.3 < alt


def _view_major_run(data, state, mask, sel_np, cfg: StaticCfg, ncols: int,
                    include_now: bool, finish, gf, chunk: int):
    """Run a view-major sweep over `mask`'s pixels: per-(view, slice)
    accumulation programs, then `finish(x, y, acc_chunk)` per pixel chunk.
    Returns ((rows, cols), finish outputs) like `run_patchmatch._chunked`."""
    shape = (data.height, data.width)
    S = data.num_src
    cyy, cxx = np.nonzero(mask)
    n = len(cxx)
    if n == 0:
        return (cyy, cxx), []
    npad = -(-n // chunk) * chunk
    x_all = np.pad(cxx, (0, npad - n)).astype(np.int32)
    y_all = np.pad(cyy, (0, npad - n)).astype(np.int32)
    from ..core.sampling import static_bands_enabled
    from ..ops.propagation import BAND_DISPATCH_STATS
    use_bands = static_bands_enabled(data.src_quads)
    sb = _view_major_sb(ncols, banded=use_bands)
    sweep = _jit_sweep_view(shape, S, cfg, sb, ncols, include_now)
    if use_bands:
        sweep_banded = _jit_sweep_view(shape, S, cfg, sb, ncols, include_now,
                                       banded=True)
        prepass = _jit_view_sweep_prepass(shape, S, cfg, sb, ncols,
                                          include_now)
    sel_at = sel_np[cyy, cxx]                     # (n, S)
    acc = jnp.zeros((npad, ncols), jnp.float32)
    dispatched = 0
    for s in range(S):
        pos = np.nonzero(sel_at[:, s])[0].astype(np.int32)
        n_sl = -(-len(pos) // sb)
        if n_sl == 0:
            continue
        # slice coordinate batches, padding lanes repeating a real pixel so
        # the band bounds cover exactly what the body gathers (their
        # scatter rows stay out of range and drop)
        pos_pad = np.pad(pos, (0, n_sl * sb - len(pos)), mode="edge")
        xs_all = cxx[pos_pad].reshape(n_sl, sb).astype(np.int32)
        ys_all = cyy[pos_pad].reshape(n_sl, sb).astype(np.int32)
        fits_np = None
        if use_bands:
            bb = prepass(data, state, jnp.asarray(xs_all),
                         jnp.asarray(ys_all), jnp.int32(s))
            fits_np = np.asarray(bb.fits)
            origins = bb.origin
            BAND_DISPATCH_STATS["view_major"][0] += int(fits_np.sum())
            BAND_DISPATCH_STATS["view_major"][1] += int(n_sl
                                                        - fits_np.sum())
        for sl in range(n_sl):
            part = pos[sl * sb:(sl + 1) * sb]
            m = len(part)
            # padding rows scatter out of range (dropped); keep pos sorted
            # and unique so the scatter-add lowers without a sort pass
            ps = npad + np.arange(sb, dtype=np.int32)
            ps[:m] = part
            args = (data, state, acc, jnp.asarray(xs_all[sl]),
                    jnp.asarray(ys_all[sl]), jnp.asarray(ps), jnp.int32(s),
                    gf)
            if fits_np is not None and fits_np[sl]:
                acc = sweep_banded(*args, origins[sl])
            else:
                acc = sweep(*args)
            dispatched += 1
            if dispatched % 16 == 0:
                # sliding completion barrier (see ops.propagation._throttle:
                # async dispatch allocates every queued program's temps)
                np.asarray(jax.device_get(acc[0, 0]))
    outs = []
    for ci in range(npad // chunk):
        sl = slice(ci * chunk, (ci + 1) * chunk)
        outs.append(finish(jnp.asarray(x_all[sl]), jnp.asarray(y_all[sl]),
                           acc[sl]))
        _throttle(outs, site="view-major")
    return (cyy, cxx), outs


def _sweep_view_bucket(max_selected: int, num_src: int) -> int:
    """Static slot count for the classify/refine view compaction: the sweeps
    cost linearly in the slot count, and the per-pixel selection rarely
    exceeds top_k (4), so sweeping the historical fixed 8 slots doubled the
    classification cost for nothing. Bucketed so few kernel variants
    compile. The bucket must COVER max_selected: a cap below it would drop
    selected views from the slot numerator while wnorm still counts their
    weights, biasing sweep costs low (and _sweep_cost's slot/all-views
    paths would disagree); pixels can select up to NUM_SAMPLES (15)
    distinct views via Monte-Carlo selection, more on initial-cost ties."""
    for b in (2, 4, 8, 16, 32):
        if max_selected <= b:
            return min(b, max(num_src, 1))
    return max(num_src, 1)


@functools.lru_cache(maxsize=64)
def _jit_confidence(shape, num_src):
    return jax.jit(filters.compute_confidence)


def run_patchmatch(
    data: CostData,
    params: PatchMatchParams,
    *,
    prior_depth: Optional[np.ndarray] = None,
    prior_normal: Optional[np.ndarray] = None,
    prior_weak: Optional[np.ndarray] = None,
    prior_confidence: Optional[np.ndarray] = None,
    valid: Optional[jnp.ndarray] = None,
    depth_min: float,
    depth_max: float,
    seed: int = 0,
    classify_chunk: int = 1 << 16,
    export_curve: bool = False,
    export_debug: bool = False,
    anchor_radius_budget: int = 25,
) -> PatchMatchOutputs:
    """Run one full PatchMatch pass for one reference view.

    `data` carries the (padded) images/cameras/depths; priors are the loaded
    previous-iteration maps at the same padded resolution.
    """
    h, w = data.height, data.width
    S = data.num_src
    shape = (h, w)
    first_init = params.state == "first_init"
    use_apd = bool(params.use_apd) and not first_init
    cfg = StaticCfg(
        prop=PropCfg(
            top_k=params.top_k,
            geom_consistency=bool(params.geom_consistency),
            use_impetus=bool(params.use_impetus),
            use_sa=bool(params.use_sa),
            refine_init=(params.state == "refine_init"),
            strong_radius=params.strong_radius,
            strong_increment=params.strong_increment,
            weak_radius=params.weak_radius,
            weak_increment=params.weak_increment),
        use_apd=use_apd,
        max_iterations=params.max_iterations,
        rotate_time=params.rotate_time)

    if valid is None:
        valid = jnp.ones((h, w), bool)
    state = PMState.create(h, w, S, valid=valid)
    if prior_weak is not None and use_apd:
        weak_dev = jnp.where(valid, jnp.asarray(prior_weak, jnp.int32), UNKNOWN)
        state = state.replace(weak=weak_dev)
    if prior_confidence is not None:
        state = state.replace(
            confidence=jnp.asarray(prior_confidence, jnp.float32))
    if prior_depth is not None:
        planes = jnp.concatenate(
            [jnp.asarray(prior_normal, jnp.float32),
             jnp.asarray(prior_depth, jnp.float32)[..., None]], axis=-1)
        state = state.replace(planes=planes)

    dmin = jnp.float32(depth_min)
    dmax = jnp.float32(depth_max)
    gf = jnp.float32(params.geom_factor)
    key = jax.random.PRNGKey(seed)

    # ---- weak-pixel compaction (host; the weak set is fixed for the pass) --
    anchors = jnp.zeros((1, ANCHOR_NUM, 2), jnp.int32) - 1
    weak_x = jnp.zeros((1,), jnp.int32)
    weak_y = jnp.zeros((1,), jnp.int32)
    weak_valid = jnp.zeros((1,), bool)
    nw = 0
    anchors_map_np = None
    if use_apd:
        weak_np = np.asarray(state.weak)
        wy, wx = np.nonzero(weak_np == WEAK)
        nw = len(wx)
        if nw > 0:
            cap = _bucket(nw)
            weak_x = jnp.asarray(np.pad(wx, (0, cap - nw)), jnp.int32)
            weak_y = jnp.asarray(np.pad(wy, (0, cap - nw)), jnp.int32)
            weak_valid = jnp.asarray(
                np.arange(cap) < nw)
            anchors_map_np = np.full((h, w), -1, np.int32)
            anchors_map_np[wy, wx] = np.arange(nw)
            key, k_anchor = jax.random.split(key)
            if cap <= _APD_SETUP_CHUNK:
                setup = _jit_apd_setup(shape, S, cfg, cap,
                                       anchor_radius_budget)
                state, anchors, _rel = setup(
                    data, state, weak_x, weak_y, weak_valid, k_anchor,
                    jnp.float32(params.ransac_threshold), dmin, dmax)
            else:
                # full-res weak lists: the (Nw, dirs*radii*jitter) probe
                # tensors of one fused gen_anchors program reach tens of GB
                # (40 GB at the 4M bucket); generate anchors one weak chunk
                # per program
                ns = _jit_jfa(shape)(state)
                gen = _jit_anchor_chunk(shape, S, cfg, _APD_SETUP_CHUNK,
                                        anchor_radius_budget)
                parts = []
                for ci in range(cap // _APD_SETUP_CHUNK):
                    sl = slice(ci * _APD_SETUP_CHUNK,
                               (ci + 1) * _APD_SETUP_CHUNK)
                    parts.append(gen(
                        jax.random.fold_in(k_anchor, ci), data, state,
                        weak_x[sl], weak_y[sl], weak_valid[sl], ns,
                        jnp.float32(params.ransac_threshold), dmin, dmax))
                    _throttle(parts, site="apd-setup")
                anchors = jnp.concatenate([p[0] for p in parts], axis=0)
                rel = jnp.concatenate([p[1] for p in parts], axis=0)
                state = _jit_neighbor_update(shape)(
                    state, weak_x, weak_y, weak_valid, rel)

    # optional per-stage wall-clock (APDE_STAGE_TIMING=1): forces a device
    # sync per stage, so only enable when measuring
    import os as _os
    import time as _time
    _timing = _os.environ.get("APDE_STAGE_TIMING") == "1"
    _marks = [("start", _time.time())]

    def _mark(name, *sync):
        if _timing:
            for a in sync:
                jax.block_until_ready(a)
            _marks.append((name, _time.time()))

    # ---- init + iterations ------------------------------------------------
    key, k_init, k_iter = jax.random.split(key, 3)
    nw_cap = int(weak_x.shape[0]) if nw > 0 else 0
    _mark("apd_setup", state.weak)
    if _iterations_host_mode(shape, S, cfg.max_iterations,
                             data.src_quads.dtype == jnp.uint8):
        # large images: one device program per chunk (the fused program
        # would exceed the remote worker's execution budget; see the
        # host-dispatch section above)
        _verify_gather_budget(data)
        from ..core.sampling import static_bands_enabled as _sbe
        chunk_s, _ = _host_chunks(
            S, banded=(not first_init) and _sbe(data.src_quads))
        state = _init_host(data, state, k_init, cfg, nw_cap, first_init,
                           weak_x, weak_y, weak_valid, anchors, dmin, dmax,
                           chunk=chunk_s)
        _host_sync("init", state)
        state = _iterations_host(data, state, k_iter, cfg, nw_cap,
                                 weak_x, weak_y, weak_valid, anchors,
                                 dmin, dmax, gf,
                                 enable_bands=not first_init)
    else:
        state = _jit_init(shape, S, cfg, nw_cap, first_init)(
            data, state, k_init, dmin, dmax, weak_x, weak_y, weak_valid,
            anchors)
        state = _jit_iterations(shape, S, cfg, nw_cap)(
            data, state, k_iter, weak_x, weak_y, weak_valid, anchors,
            dmin, dmax, gf)
    _mark("init+sweeps", state.costs)

    # ---- reliability classification (compacted + chunked) -----------------
    # Pixels the sweep would classify UNKNOWN without sampling anything
    # (margins, padding, zero depth, empty selection — the guard conditions
    # of DepthToWeak, APD.cu:2107-2119) are skipped on the host, and the
    # sweeps' per-pixel view slots shrink to the actual max selection count:
    # both cut the dominant 61-step sweep cost without changing any output.
    total = h * w
    sel_count_map = np.asarray(state.selected.sum(-1))
    depth_map = np.asarray(state.planes[..., 3])
    valid_np = np.asarray(state.valid)
    sweep_k = _sweep_view_bucket(int(sel_count_map.max()), S)
    min_margin = 6
    ys_g, xs_g = np.mgrid[0:h, 0:w]
    margin_np = (xs_g < min_margin) | (ys_g < min_margin) \
        | (xs_g >= data.img_w - min_margin) | (ys_g >= data.img_h - min_margin)
    sweepable = valid_np & (depth_map != 0.0) & (sel_count_map > 0)
    chunk = min(classify_chunk, total)

    def _chunked(fn, mask):
        """Run a flat-pixel-batch jit over mask's pixels in fixed chunks;
        yields ((rows, cols), flat results). Throttled: async dispatch
        allocates every queued chunk's temps at enqueue (see ops.propagation
        _throttle)."""
        cyy, cxx = np.nonzero(mask)
        n = len(cxx)
        if n == 0:
            return (cyy, cxx), []
        pad = (-n) % chunk
        cx_p = np.pad(cxx, (0, pad)).astype(np.int32)
        cy_p = np.pad(cyy, (0, pad)).astype(np.int32)
        outs = []
        for s in range(len(cx_p) // chunk):
            outs.append(fn(jnp.asarray(cx_p[s * chunk:(s + 1) * chunk]),
                           jnp.asarray(cy_p[s * chunk:(s + 1) * chunk])))
            _throttle(outs, site="viewmajor-chunk")
        return (cyy, cxx), outs

    # curve export is a debug mode: sweep everything so the exported curve
    # covers every pixel, as the reference's exporter does
    cls_mask = np.ones((h, w), bool) if export_curve \
        else (sweepable & ~margin_np)
    use_vm = _use_view_major(data, sel_count_map, sweepable, sweep_k)
    sel_np = np.asarray(state.selected) if use_vm else None
    if use_vm:
        finish = _jit_classify_finish(shape, S, cfg, chunk, export_curve)
        (cls_y, cls_x), outs = _view_major_run(
            data, state, cls_mask, sel_np, cfg,
            filters.RELIABLE_CURVE_SAMPLE_NUM, False,
            lambda cx, cy, acc: finish(data, state, cx, cy, acc,
                                       jnp.int32(params.weak_peak_radius),
                                       dmin, dmax), gf, chunk)
    else:
        classify = _jit_classify(shape, S, cfg, chunk, export_curve, sweep_k)
        (cls_y, cls_x), outs = _chunked(
            lambda cx, cy: classify(data, state, cx, cy,
                                    jnp.int32(params.weak_peak_radius), gf,
                                    dmin, dmax), cls_mask)
    weak_map = np.full((h, w), UNKNOWN, np.int32)
    reliable_curve = None
    if outs:
        weak_map[cls_y, cls_x] = np.concatenate(
            [np.asarray(o[0]) for o in outs])[:len(cls_x)]
        if export_curve:
            reliable_curve = np.zeros(
                (h, w, np.asarray(outs[0][1]).shape[-1]), np.float32)
            reliable_curve[cls_y, cls_x] = np.concatenate(
                [np.asarray(o[1]) for o in outs])[:len(cls_x)]
    state = state.replace(weak=jnp.asarray(weak_map, jnp.int32))
    _mark("classify", state.weak)

    # ---- confidence + local refine ----------------------------------------
    if params.geom_consistency or use_apd:
        state = _jit_confidence(shape, S)(data, state)
    _mark("confidence", state.confidence)
    if use_vm:
        rfinish = _jit_refine_finish(shape, S, cfg, chunk)
        (ref_y, ref_x), outs = _view_major_run(
            data, state, sweepable, sel_np, cfg, 12, True,
            lambda cx, cy, acc: rfinish(data, state, cx, cy, acc, dmin, dmax),
            gf, chunk)
    else:
        refine = _jit_local_refine(shape, S, cfg, chunk, sweep_k)
        (ref_y, ref_x), outs = _chunked(
            lambda cx, cy: refine(data, state, cx, cy, gf, dmin, dmax),
            sweepable)
    depth_map = depth_map.copy()
    if outs:
        depth_map[ref_y, ref_x] = np.concatenate(
            [np.asarray(o) for o in outs])[:len(ref_x)]
    state = state.replace(
        planes=state.planes.at[..., 3].set(jnp.asarray(depth_map)))
    _mark("local_refine", state.planes)
    if _timing:
        spans = [f"{n} {(_marks[i + 1][1] - _marks[i][1]) * 1000:.0f}ms"
                 for i, (n, _) in enumerate(_marks[1:])]
        print("  stage timing: " + ", ".join(spans), flush=True)

    nearest_strong_np = fit_normal_np = None
    if export_debug and use_apd and nw > 0:
        # debug capabilities mirroring the reference's (unused) exporters
        # ExportNearestStrong / ExportFitNormal (APD.cu:2600-2649)
        ns = anchor_ops.nearest_strong_jfa(state.weak, state.confidence,
                                           state.valid)
        nearest_strong_np = np.asarray(ns)
        cam_planes = filters.depth_normal_to_planes(
            data, state.planes[..., 3], state.planes[..., :3])
        fit = anchor_ops.ransac_fit_planes(
            jax.random.PRNGKey(seed ^ 0x5F17), data,
            state.replace(planes=cam_planes), weak_x, weak_y, weak_valid,
            anchors)
        fit_normal_np = np.asarray(fit)[:nw]

    planes_np = np.asarray(state.planes)
    return PatchMatchOutputs(
        depth=planes_np[..., 3].copy(),
        normal=planes_np[..., :3].copy(),
        weak=np.asarray(state.weak).astype(np.uint8),
        confidence=np.clip(np.asarray(state.confidence), 0, 255
                           ).astype(np.uint8),
        cost=np.asarray(state.costs),
        anchors=(np.asarray(anchors)[:nw] if use_apd and nw > 0 else None),
        anchors_map=anchors_map_np,
        reliable_curve=reliable_curve,
        nearest_strong=nearest_strong_np,
        fit_normal=fit_normal_np,
    )
