"""Per-scan reconstruction driver — problems, multi-scale loop, per-view I/O
(reference: main.cpp:44-411 + APD::InuputInitialization, APD.cpp:501-685).

`run_scan` is the `APD --dense_folder ...` equivalent: builds the problem
list from pair.txt, runs the coarse-to-fine pass schedule over all views, and
finishes with fusion.
"""

from __future__ import annotations

import dataclasses
import os
import time
from pathlib import Path
from typing import List, Optional, Sequence

import numpy as np

from .. import config as cfg
from ..config import PYRAMID_BASE_MAX_DIM, STRONG, UNKNOWN, WEAK
from ..core import geometry as geo
from ..io import MemoryCache, read_bin_mat, write_bin_mat
from ..io.cameras import Camera, read_camera, read_pair
from ..io.images import (SUPPORTED_EXTS, read_image_gray, resize_bilinear,
                         resize_nearest, scaled_size)
from ..ops.cost import CostData
from ..tools import visualize
from .patchmatch import PatchMatchOutputs, pad_to_multiple, run_patchmatch

PAD_H = 8
PAD_W = 8


@dataclasses.dataclass
class Problem:
    """One reference view's reconstruction job (reference: main.h:102-115)."""

    ref_image_id: int
    src_image_ids: List[int]
    dense_folder: Path
    result_folder: Path
    img_ext: str
    used_time_ms: float = 0.0


def format_index(i: int) -> str:
    return f"{i:08d}"


def generate_sample_list(dense_folder) -> List[Problem]:
    """pair.txt -> problems (reference: GenerateSampleList, main.cpp:44-102)."""
    dense_folder = Path(dense_folder)
    image_folder = dense_folder / "images"
    problems = []
    for ref_id, src_ids in read_pair(dense_folder / "pair.txt"):
        ext = ""
        for cand in SUPPORTED_EXTS:
            if (image_folder / (format_index(ref_id) + cand)).exists():
                ext = cand
                break
        if not ext:
            raise FileNotFoundError(
                f"can not find image {format_index(ref_id)} in {image_folder}")
        result_folder = dense_folder / "APD" / format_index(ref_id)
        result_folder.mkdir(parents=True, exist_ok=True)
        problems.append(Problem(ref_id, src_ids, dense_folder, result_folder,
                                ext))
    return problems


def check_images(problems: Sequence[Problem],
                 cache: Optional[MemoryCache] = None) -> bool:
    """All images must share one resolution (reference: main.cpp:104-127)."""
    shape = None
    for p in problems:
        img = read_image_gray(
            p.dense_folder / "images" / (format_index(p.ref_image_id) + p.img_ext),
            cache=cache)
        if shape is None:
            shape = img.shape
        elif img.shape != shape:
            return False
    return True


def compute_round_num(problems: Sequence[Problem],
                      cache: Optional[MemoryCache] = None,
                      base: int = PYRAMID_BASE_MAX_DIM) -> int:
    p = problems[0]
    img = read_image_gray(
        p.dense_folder / "images" / (format_index(p.ref_image_id) + p.img_ext),
        cache=cache)
    return cfg.compute_round_num(max(img.shape), base)


def _load_scaled_view(problem: Problem, view_id: int, scale_size: int,
                      cache) -> tuple:
    img = read_image_gray(
        problem.dense_folder / "images" / (format_index(view_id) + problem.img_ext),
        cache=cache)
    cam = read_camera(
        problem.dense_folder / "cams" / (format_index(view_id) + "_cam.txt"),
        cache=cache)
    h, w = img.shape
    if scale_size != 1:
        nh, nw = scaled_size(h, w, scale_size)
        simg = resize_bilinear(img, (nh, nw))
        cam = cam.scaled(nw / w, nh / h, nw, nh)
    else:
        simg = img
        cam = dataclasses.replace(cam, width=w, height=h)
    return simg, cam


def process_problem(problem: Problem, spec: cfg.PassSpec,
                    cache: Optional[MemoryCache] = None,
                    seed: int = 0,
                    export_anchor: bool = False,
                    export_curve: bool = False,
                    show_medium_result: Optional[bool] = None) -> None:
    """One PatchMatch pass for one view: load inputs, run the engine, persist
    results (reference: ProcessProblem, main.cpp:148-208)."""
    import jax.numpy as jnp

    params = spec.params
    t0 = time.time()
    geom_or_apd = params.geom_consistency or params.use_apd
    use_apd = params.use_apd and spec.params.state != "first_init"

    ref_img, ref_cam = _load_scaled_view(problem, problem.ref_image_id,
                                         spec.scale_size, cache)
    src = [_load_scaled_view(problem, sid, spec.scale_size, cache)
           for sid in problem.src_image_ids]
    h, w = ref_img.shape
    depth_min = ref_cam.depth_min * cfg.DEPTH_MIN_FACTOR
    depth_max = ref_cam.depth_max * cfg.DEPTH_MAX_FACTOR

    # ---- padded device layout --------------------------------------------
    ref_p = pad_to_multiple(ref_img, PAD_H, PAD_W)
    ph, pw = ref_p.shape
    valid = np.zeros((ph, pw), bool)
    valid[:h, :w] = True
    src_imgs = np.stack([pad_to_multiple(s[0], PAD_H, PAD_W) for s in src]) \
        if src else np.zeros((0, ph, pw), np.float32)

    def _load_resized_bin(path):
        mat = read_bin_mat(path, cache=cache)
        if mat.shape[:2] != (h, w):
            mat = resize_nearest(mat, (h, w))
        return mat

    src_depths = None
    if geom_or_apd:
        neigh = [_load_resized_bin(
            problem.dense_folder / "APD" / format_index(sid) / "depths.bin")
            for sid in problem.src_image_ids]
        src_depths = np.stack(
            [pad_to_multiple(d.astype(np.float32), PAD_H, PAD_W,
                             mode="constant") for d in neigh]) \
            if neigh else np.zeros((0, ph, pw), np.float32)

    sa_mask = None
    if use_apd and params.use_sa:
        sa_path = problem.dense_folder / "sa_masks" / \
            (format_index(problem.ref_image_id) + ".bin")
        if sa_path.exists():
            sa = _load_resized_bin(sa_path).astype(np.int32)
            sa_mask = pad_to_multiple(sa, PAD_H, PAD_W, mode="constant")

    prior_depth = prior_normal = prior_weak = prior_conf = None
    if params.state != "first_init":
        depth = _load_resized_bin(problem.result_folder / "depths.bin")
        normal = _load_resized_bin(problem.result_folder / "normals.bin")
        prior_depth = pad_to_multiple(depth.astype(np.float32), PAD_H, PAD_W,
                                      mode="constant")
        prior_normal = pad_to_multiple(normal.astype(np.float32), PAD_H, PAD_W,
                                       mode="constant")
    if use_apd:
        weak = _load_resized_bin(problem.result_folder / "weak.bin")
        conf = _load_resized_bin(problem.result_folder / "confidence.bin")
        n_weak = int((weak == WEAK).sum())
        print(f"Weak count: {n_weak} / {weak.size} = "
              f"{n_weak / weak.size * 100:.1f}%", flush=True)
        prior_weak = pad_to_multiple(weak.astype(np.int32), PAD_H, PAD_W,
                                     mode="constant",)
        prior_conf = pad_to_multiple(conf.astype(np.float32), PAD_H, PAD_W,
                                     mode="constant")

    import jax

    cam_list = [ref_cam] + [c for _, c in src]
    cams = geo.CameraArrays.from_cameras(cam_list)
    src_cams = geo.CameraArrays(*[a[1:] for a in cams])
    data = CostData.build(
        cams.view(0), src_cams, jnp.asarray(ref_p),
        jnp.asarray(src_imgs), sa_mask=sa_mask,
        src_depths=jnp.asarray(src_depths) if src_depths is not None else None,
        real_width=w, real_height=h, sampler_u8=params.sampler_u8)

    pass_seed = (seed * 1000003 + problem.ref_image_id * 131 + spec.iteration)
    t_pm = time.time()
    out = run_patchmatch(
        data, params,
        prior_depth=prior_depth, prior_normal=prior_normal,
        prior_weak=prior_weak, prior_confidence=prior_conf,
        valid=jnp.asarray(valid),
        depth_min=depth_min, depth_max=depth_max, seed=pass_seed,
        export_curve=export_curve, export_debug=export_anchor)
    pm_ms = (time.time() - t_pm) * 1000
    problem.used_time_ms += pm_ms

    persist_view_results(
        problem, spec, out.depth[:h, :w], out.normal[:h, :w],
        out.weak[:h, :w], out.confidence[:h, :w], depth_min, depth_max,
        geom_or_apd, cache,
        show_medium_result=(show_medium_result
                            if show_medium_result is not None
                            else spec.show_medium_result))

    if export_anchor and out.anchors is not None:
        write_bin_mat(problem.result_folder / "anchors_map.bin",
                      out.anchors_map[:h, :w], cache=None)
        _write_anchors(problem.result_folder / "anchors.bin", out.anchors)
        if out.nearest_strong is not None:
            _export_nearest_strong(
                problem.result_folder / f"nearest_strong_{spec.iteration}.png",
                out.nearest_strong[:h, :w])
        if out.fit_normal is not None:
            fit_map = np.zeros((h, w, 3), np.float32)
            am = out.anchors_map[:h, :w]
            sel = am >= 0
            fit_map[sel] = out.fit_normal[am[sel], :3]
            visualize.show_normal_map(
                problem.result_folder / f"fit_normal_{spec.iteration}.png",
                fit_map)
    if export_curve and out.reliable_curve is not None:
        _write_reliable_curve(problem.result_folder / "reliable_curve.bin",
                              out.reliable_curve[:h, :w])

    total_ms = (time.time() - t0) * 1000
    print(f"Processed view {format_index(problem.ref_image_id)} "
          f"iter {spec.iteration}: PatchMatch {pm_ms:.0f} ms, "
          f"total {total_ms:.0f} ms", flush=True)


def persist_view_results(problem: Problem, spec: cfg.PassSpec,
                         depth: np.ndarray, normal: np.ndarray,
                         weak: np.ndarray, confidence: np.ndarray,
                         depth_min: float, depth_max: float,
                         geom_or_apd: bool, cache,
                         show_medium_result: bool = False) -> None:
    """Range-clamp + persist one view's pass outputs (already cropped to the
    real resolution); shared by the serial and view-parallel engines
    (reference: main.cpp:168-190)."""
    depth = depth.astype(np.float32)
    normal = normal.astype(np.float32)
    weak = weak.astype(np.uint8)
    out_of_range = (depth < depth_min) | (depth > depth_max)
    depth = np.where(out_of_range, 0.0, depth)
    weak = np.where(out_of_range, np.uint8(UNKNOWN), weak)

    write_bin_mat(problem.result_folder / "depths.bin", depth, cache=cache)
    write_bin_mat(problem.result_folder / "normals.bin", normal, cache=cache)
    write_bin_mat(problem.result_folder / "weak.bin", weak, cache=cache)
    if geom_or_apd:
        write_bin_mat(problem.result_folder / "confidence.bin", confidence,
                      cache=cache)

    if show_medium_result:
        it = spec.iteration
        visualize.show_depth_map(
            problem.result_folder / f"depth_{it}.jpg", depth, depth_min,
            depth_max)
        visualize.show_normal_map(
            problem.result_folder / f"normal_{it}.jpg", normal)
        visualize.show_weak_image(
            problem.result_folder / f"weak_{it}.png", weak)
        if geom_or_apd:
            visualize.show_confidence_map(
                problem.result_folder / f"confidence_{it}.png", confidence)


def _export_nearest_strong(path, nearest: np.ndarray) -> None:
    """Random color per nearest-strong target (reference: ExportNearestStrong,
    APD.cu:2628-2649)."""
    from ..io.images import write_image

    h, w, _ = nearest.shape
    flat = nearest[..., 1].astype(np.int64) * w + nearest[..., 0]
    flat = np.where((nearest[..., 0] >= 0), flat, h * w)
    rng = np.random.default_rng(0)
    palette = rng.integers(0, 255, size=(h * w + 1, 3)).astype(np.uint8)
    palette[h * w] = 0
    write_image(path, palette[flat])


def _write_anchors(path, anchors: np.ndarray) -> None:
    """anchors.bin: int32 weak_count, int32 ANCHOR_NUM, then int16 (x, y)
    pairs (reference: ExportAnchors, APD.cu:2614-2626)."""
    with open(path, "wb") as f:
        nw, an, _ = anchors.shape
        np.asarray([nw, an], np.int32).tofile(f)
        anchors.astype(np.int16).tofile(f)


def _write_reliable_curve(path, curve: np.ndarray) -> None:
    """reliable_curve.bin: int32 width, height, num_samples, then floats
    (reference: ExportReliableCurve, APD.cu:2651-2661)."""
    h, w, n = curve.shape
    with open(path, "wb") as f:
        np.asarray([w, h, n], np.int32).tofile(f)
        curve.astype(np.float32).tofile(f)


def run_scan(dense_folder, dataset: str = "General", *,
             only_fuse: bool = False, no_fuse: bool = False,
             use_memory_cache: bool = True, use_sa: bool = True,
             use_impetus: bool = True, weak_filter: bool = True,
             flush: bool = False, export_anchor: bool = False,
             export_curve: bool = False, export_color: bool = True,
             seed: int = 0, pyramid_base: int = PYRAMID_BASE_MAX_DIM,
             fuse_shard=None, views_parallel: Optional[bool] = None,
             view_batch: Optional[int] = None,
             sampler_u8: bool = True, start_iteration: int = 0) -> None:
    """Full scan reconstruction (reference: main.cpp:210-411).

    ``views_parallel``: run every view's pass simultaneously with views
    sharded over all local devices (pipeline.scan_parallel). Default (None)
    auto-enables when more than one device is attached.

    ``start_iteration``: skip schedule passes below this iteration index —
    coarse mid-scan recovery on top of the reference's restart model
    (SURVEY §5.3: per-view bins ARE the checkpoint; every non-first pass
    rebuilds its state from disk, so re-entering at a pass boundary after
    a crash/wedge is exact up to the Jacobi staleness resume already has).
    """
    from ..core.platform import enable_compilation_cache
    from .fusion import run_fusion

    enable_compilation_cache()

    dense_folder = Path(dense_folder)
    (dense_folder / "APD").mkdir(exist_ok=True)
    cache = MemoryCache() if use_memory_cache and not only_fuse else None
    problems = generate_sample_list(dense_folder)
    if not check_images(problems, cache):
        raise RuntimeError("Images may error, check it!")
    print(f"There are {len(problems)} problems to be processed", flush=True)

    fusion_params = cfg.FusionParams(
        variant={"TaT_a": "tat_a", "TaT_i": "tat_i"}.get(dataset, "general"),
        weak_filter=weak_filter)
    if only_fuse:
        run_fusion(dense_folder, problems, "APD.ply", fusion_params,
                   export_color=export_color, cache=cache, shard=fuse_shard)
        return

    round_num = compute_round_num(problems, cache, base=pyramid_base)
    print(f"Round nums: {round_num}", flush=True)
    p0 = problems[0]
    img0 = read_image_gray(
        p0.dense_folder / "images" / (format_index(p0.ref_image_id) + p0.img_ext),
        cache=cache)
    schedule = cfg.build_schedule(max(img0.shape), dataset, use_sa=use_sa,
                                  use_impetus=use_impetus, base=pyramid_base,
                                  sampler_u8=sampler_u8)
    if views_parallel is None:
        import jax
        # LOCAL devices: under multi-host scan partitioning
        # (parallel.distributed) each process drives its own scans on its
        # own chips; global arrays would not be host-readable here. An
        # explicit cross-host mesh (parallel.mesh/scene) remains the
        # opt-in route for sharding ONE scan across hosts.
        views_parallel = len(jax.local_devices()) > 1
    runner = None
    if views_parallel:
        from .scan_parallel import ViewParallelRunner
        runner = ViewParallelRunner(problems, cache, seed=seed,
                                    view_batch=view_batch)

    t0 = time.time()
    for spec in schedule:
        if spec.iteration < start_iteration:
            print(f"======== iteration {spec.iteration} skipped "
                  f"(resume from {start_iteration}) ========", flush=True)
            continue
        print(f"======== iteration {spec.iteration} (round {spec.round_index},"
              f" scale 1/{spec.scale_size}, {spec.params.state}) ========",
              flush=True)
        # debug exports (anchors/curves) need the serial engine's host stages
        debug_pass = spec.is_last_iteration and (export_anchor or export_curve)
        # the SPMD view-parallel pass dispatches three programs per batch
        # (sweeps / classify / finish); bound views-per-device so the worst
        # stage stays under the worker's execution budget, and fall back to
        # the serial host-dispatched engine when even a single view's stage
        # exceeds it (full-res rounds — the file interchange lets engines
        # alternate at pass boundaries)
        if runner is not None and not debug_pass:
            from .patchmatch import _PROGRAM_BUDGET_S, spmd_stage_seconds
            eff = (-(-img0.shape[0] // spec.scale_size),
                   -(-img0.shape[1] // spec.scale_size))
            n_src = max(len(p.src_image_ids) for p in problems)
            per_view = spmd_stage_seconds(eff, n_src, spec.params)
            import jax as _jax
            n_dev = len(_jax.local_devices())
            # tile route (parallel.tile_pass): one view's pass row-sharded
            # over ALL chips — engaged when views would leave chips idle
            # (V < devices) or a single view busts the worker budget. APD
            # passes route here too since round 5: the weak machinery
            # (anchors / fit RANSAC / deformable sweeps) is sharded over
            # the compacted weak list, so the whole stage estimate shrinks
            # by the device count (only the full-image JFA is replicated).
            if n_dev > 1 \
                    and (len(problems) < n_dev
                         or per_view > _PROGRAM_BUDGET_S) \
                    and per_view / n_dev <= _PROGRAM_BUDGET_S:
                runner.run_pass_tiled(spec)
                continue
            if per_view <= _PROGRAM_BUDGET_S:
                runner.run_pass(spec, max_views_per_device=max(
                    1, int(_PROGRAM_BUDGET_S / per_view)))
                continue
        for problem in problems:
            process_problem(
                problem, spec, cache=cache, seed=seed,
                export_anchor=export_anchor and spec.is_last_iteration,
                export_curve=export_curve and spec.is_last_iteration)
    print(f"Cost time: {(time.time() - t0) * 1000:.0f} ms", flush=True)
    avg = np.mean([p.used_time_ms for p in problems]) if problems else 0
    print(f"Average used time: {avg:.0f} ms", flush=True)

    if cache is not None and flush:
        cache.flush()
    if no_fuse:
        print("Skip fusion, all done!", flush=True)
        return
    run_fusion(dense_folder, problems, "APD.ply", fusion_params,
               export_color=export_color, cache=cache, shard=fuse_shard)
    print("All done", flush=True)
