"""Host orchestration of the multi-chip scan engine.

`ViewParallelRunner` replaces the serial `for problem: process_problem(...)`
inner loop of `run_scan` with one SPMD program per pass: every reference
view's complete PatchMatch pass runs simultaneously, views sharded over the
local device mesh (`parallel.scene`), with the reference's file-based
neighbor-depth exchange (APD.cpp:592-610) becoming an ICI all-gather.

Files remain the interchange between passes — each pass reads the previous
pass's depths/normals/weak/confidence bins (through the write-through memory
cache) and persists its own, exactly like the serial engine, so resume /
only_fuse / visualization semantics are unchanged and a scan can switch
between serial and parallel engines at any pass boundary.

Pass-ordering semantics: the serial engine processes views in order within a
pass, so a geometric pass sees *current-pass* depths for already-processed
neighbors (incidental Gauss-Seidel). The parallel engine is Jacobi: every
view reads the *previous* pass's depths. This matches the reference's own
multi-GPU behavior (concurrently scheduled scans see whatever is on disk)
and is the only formulation that parallelizes; photometric passes are
bitwise identical to the serial engine (pinned by tests/test_full_pass.py).
"""

from __future__ import annotations

import time
from concurrent.futures import ThreadPoolExecutor
from typing import Dict, List, Optional

import numpy as np

from .. import config as cfg
from ..config import UNKNOWN, WEAK
from ..io import MemoryCache, read_bin_mat
from ..io.images import resize_nearest
from .driver import (PAD_H, PAD_W, Problem, _load_scaled_view, format_index,
                     persist_view_results)
from .full_pass import PassStatic
from .patchmatch import _bucket, pad_to_multiple


class _RoundData:
    """Per-pyramid-round scene tables for one view batch (rebuilt when the
    scale changes).

    With `scan_ref_ids` covering more reference views than `problems` (the
    batched mode for scans whose image tables exceed device memory), the
    image table only holds this batch's views, and source views whose
    reference pass runs in ANOTHER batch read their prior depths from the
    file interchange (ext rows) instead of the in-batch ICI all-gather.
    """

    def __init__(self, problems: List[Problem], scale_size: int, cache,
                 n_devices: int, scan_ref_ids=None, sampler_u8: bool = True):
        from ..parallel.scene import dummy_camera

        self.scale_size = scale_size
        ids: List[int] = []
        for p in problems:
            for vid in [p.ref_image_id] + list(p.src_image_ids):
                if vid not in ids:
                    ids.append(vid)
        slot = {vid: i for i, vid in enumerate(ids)}
        M = len(ids)
        # pad the table to a bucketed size so view batches of one scan share
        # a compiled program
        Mp = -(-M // 8) * 8

        images = []
        cams = []
        for vid in ids:
            img, cam = _load_scaled_view(problems[0], vid, scale_size, cache)
            images.append(pad_to_multiple(img, PAD_H, PAD_W))
            cams.append(cam)
        self.h, self.w = img.shape
        self.ph, self.pw = images[0].shape
        dK, dR, dt, dc = dummy_camera(cams[0].K.astype(np.float32))
        pad_n = Mp - M + 1          # table pad rows + the dummy slot Mp
        table = np.concatenate(
            [np.stack(images),
             np.zeros((pad_n, self.ph, self.pw), np.float32)])
        # under the u8 sampler the whole replicated table stores u8 (the
        # same integer grid the quad pack would round to): 4x less HBM per
        # device, the binding constraint for TaT-scale view counts
        self.images = np.clip(np.round(table), 0, 255).astype(np.uint8) \
            if sampler_u8 else table
        self.cam_K = np.concatenate(
            [np.stack([c.K for c in cams]).astype(np.float32),
             np.repeat(dK[None], pad_n, 0)])
        self.cam_R = np.concatenate(
            [np.stack([c.R for c in cams]).astype(np.float32),
             np.repeat(dR[None], pad_n, 0)])
        self.cam_t = np.concatenate(
            [np.stack([c.t for c in cams]).astype(np.float32),
             np.repeat(dt[None], pad_n, 0)])
        self.cam_c = np.concatenate(
            [np.stack([c.c for c in cams]).astype(np.float32),
             np.repeat(dc[None], pad_n, 0)])

        V = len(problems)
        self.S = max(len(p.src_image_ids) for p in problems)
        n_mesh = min(n_devices, V)
        self.Vp = -(-V // n_mesh) * n_mesh
        self.n_mesh = n_mesh
        # padded problem slots repeat problem 0; outputs are discarded
        probs = list(problems) + [problems[0]] * (self.Vp - V)
        self.pair = np.full((self.Vp, self.S), Mp, np.int32)
        self.ref_slot = np.zeros((self.Vp,), np.int32)
        self.dmin = np.zeros((self.Vp,), np.float32)
        self.dmax = np.zeros((self.Vp,), np.float32)
        for i, p in enumerate(probs):
            self.ref_slot[i] = slot[p.ref_image_id]
            for j, sid in enumerate(p.src_image_ids):
                self.pair[i, j] = slot[sid]
            ref_cam = cams[slot[p.ref_image_id]]
            self.dmin[i] = ref_cam.depth_min * cfg.DEPTH_MIN_FACTOR
            self.dmax[i] = ref_cam.depth_max * cfg.DEPTH_MAX_FACTOR
        # table slot -> row in the depth stack [gathered Vp | zeros | ext]:
        # in-batch reference views read the all-gathered current priors;
        # other batches' reference views read file-interchange ext rows;
        # ids that are never reference views have no depth map -> dummy row
        ref_row = {p.ref_image_id: i for i, p in enumerate(problems)}
        scan_refs = set(scan_ref_ids) if scan_ref_ids is not None \
            else set(ref_row)
        self.ext_ids: List[int] = []
        self.depth_slot = np.full((Mp + 1,), self.Vp, np.int32)
        for vid, s in slot.items():
            if vid in ref_row:
                self.depth_slot[s] = ref_row[vid]
            elif vid in scan_refs:
                self.depth_slot[s] = self.Vp + 1 + len(self.ext_ids)
                self.ext_ids.append(vid)
        self.Ep = (-(-len(self.ext_ids) // 4) * 4) if self.ext_ids else 0
        self.valid = np.zeros((self.ph, self.pw), bool)
        self.valid[:self.h, :self.w] = True


class ViewParallelRunner:
    """Runs each PassSpec for all views at once on the local device mesh."""

    def __init__(self, problems: List[Problem], cache: Optional[MemoryCache],
                 seed: int = 0, mesh=None, anchor_radius_budget: int = 25,
                 view_batch: Optional[int] = None):
        self.problems = problems
        self.cache = cache
        self.seed = seed
        self.mesh = mesh
        self.radius_budget = anchor_radius_budget
        # view_batch caps how many reference views run in one SPMD program:
        # the image table and depth stack scale with the batch, not the
        # scan, so arbitrarily large scans (TaT ~150+ views) fit device
        # memory. None = whole scan in one batch.
        self.view_batch = view_batch
        self._rounds: Dict[tuple, _RoundData] = {}

    def _auto_view_batch(self) -> int:
        """Largest batch whose device-resident state fits the HBM budget.

        Per-view full-res cost ~= 64 bytes/px (prior+output map stacks plus
        the all-gathered depth stack every device materializes) plus ~5
        bytes/px of image-table share; budgeted against half of a 16 GB v5e
        HBM so compute workspace and padding have headroom. Small scans
        resolve to 'whole scan'; TaT-scale scans self-cap."""
        p0 = self.problems[0]
        img, _ = _load_scaled_view(p0, p0.ref_image_id, 1, self.cache)
        px = img.shape[0] * img.shape[1]
        budget = 8 << 30
        per_view = 70 * px
        n = max(1, min(len(self.problems), budget // per_view))
        return int(n)

    def _n_devices(self) -> int:
        import jax
        return len(jax.local_devices()) if self.mesh is None \
            else self.mesh.devices.size

    def _batches(self, cap: Optional[int] = None) -> List[List[Problem]]:
        vb = self.view_batch
        if vb is None:
            vb = self.view_batch = self._auto_view_batch()
        if cap:
            vb = min(vb, cap) if vb else cap
        if not vb or vb >= len(self.problems):
            return [self.problems]
        batches = [self.problems[i:i + vb]
                   for i in range(0, len(self.problems), vb)]
        # pad the ragged tail batch to the uniform size (duplicate the last
        # problem; duplicate outputs are dedup-skipped at persist). A
        # 120-view scan at vb=7 otherwise compiles a SECOND program family
        # for its 1-view tail — each fresh shape costs tens of minutes
        # through the remote tunnel (PERF_NOTES r4 compile caveat).
        if len(batches) > 1 and len(batches[-1]) < vb:
            tail = batches[-1]
            batches[-1] = tail + [tail[-1]] * (vb - len(tail))
        return batches

    def _round_data(self, spec: cfg.PassSpec, batch: List[Problem]
                    ) -> _RoundData:
        # keyed by the batch slice itself (first ref id + length), not the
        # batch index: per-pass execution-budget caps can re-batch the same
        # scan differently between passes
        key = (spec.scale_size, batch[0].ref_image_id, len(batch))
        if key not in self._rounds:
            self._rounds = {k: v for k, v in self._rounds.items()
                            if k[0] == spec.scale_size}
            self._rounds[key] = _RoundData(
                batch, spec.scale_size, self.cache, self._n_devices(),
                scan_ref_ids=[p.ref_image_id for p in self.problems],
                sampler_u8=bool(spec.params.sampler_u8))
        return self._rounds[key]

    def _load_prior(self, problem: Problem, name: str, rd: _RoundData,
                    dtype=np.float32, channels: int = 0) -> np.ndarray:
        mat = read_bin_mat(problem.result_folder / name, cache=self.cache)
        if mat.shape[:2] != (rd.h, rd.w):
            mat = resize_nearest(mat, (rd.h, rd.w))
        return pad_to_multiple(mat.astype(dtype), PAD_H, PAD_W,
                               mode="constant")

    def run_pass_tiled(self, spec: cfg.PassSpec) -> None:
        """Run one pass view-by-view, each view's pass row-sharded over ALL
        devices (parallel.tile_pass): the few-views-many-chips route and
        the over-budget route. APD passes shard their weak machinery over
        the compacted weak list (round 5), so the whole per-view stage
        estimate shrinks by the device count. File interchange semantics
        match the serial engine (Jacobi neighbor depths)."""
        import jax
        import jax.numpy as jnp
        from jax.sharding import Mesh
        from ..ops.selection import NUM_SAMPLES
        from ..parallel.tile_pass import TileInputs, build_tile_pass

        params = spec.params
        geom_or_apd = params.geom_consistency or params.use_apd
        use_apd = params.use_apd and params.state != "first_init"
        first_init = params.state == "first_init"
        devices = jax.local_devices() if self.mesh is None \
            else list(self.mesh.devices.reshape(-1))
        n = len(devices)
        mesh = Mesh(np.asarray(devices), ("tiles",))
        by_ref = {p.ref_image_id: p for p in self.problems}

        for problem in self.problems:
            t0 = time.time()
            img, cam = _load_scaled_view(problem, problem.ref_image_id,
                                         spec.scale_size, self.cache)
            h, w = img.shape
            # shard heights must be even: pad rows to a multiple of 2 * n
            ref_p = pad_to_multiple(img, max(PAD_H, 2 * n), PAD_W)
            ph, pw = ref_p.shape
            valid = np.zeros((ph, pw), bool)
            valid[:h, :w] = True
            src_imgs, src_cams, src_depths = [], [], []
            for sid in problem.src_image_ids:
                simg, scam = _load_scaled_view(problem, sid, spec.scale_size,
                                               self.cache)
                src_imgs.append(pad_to_multiple(simg, max(PAD_H, 2 * n),
                                                PAD_W))
                src_cams.append(scam)
                if geom_or_apd and sid in by_ref:
                    d = read_bin_mat(by_ref[sid].result_folder / "depths.bin",
                                     cache=self.cache)
                    if d.shape[:2] != (h, w):
                        d = resize_nearest(d, (h, w))
                    src_depths.append(pad_to_multiple(
                        d.astype(np.float32), max(PAD_H, 2 * n), PAD_W,
                        mode="constant"))
                else:
                    src_depths.append(np.zeros((ph, pw), np.float32))
            from ..core import geometry as geo
            ref_cam = geo.CameraArrays.from_cameras([cam]).view(0)
            scams = geo.CameraArrays.from_cameras(src_cams)

            prior_depth = np.zeros((ph, pw), np.float32)
            prior_normal = np.zeros((ph, pw, 3), np.float32)
            prior_weak = np.full((ph, pw), UNKNOWN, np.int32)
            prior_conf = np.ones((ph, pw), np.float32)
            sa = np.zeros((ph, pw), np.int32)
            if params.use_sa:
                sa_path = problem.dense_folder / "sa_masks" / \
                    (format_index(problem.ref_image_id) + ".bin")
                if sa_path.exists():
                    mat = read_bin_mat(sa_path, cache=self.cache)
                    if mat.shape[:2] != (h, w):
                        mat = resize_nearest(mat, (h, w))
                    sa[:h, :w] = mat.astype(np.int32)
            if not first_init:
                prior_depth[:] = self._tile_prior(problem, "depths.bin",
                                                  (h, w), (ph, pw))
                prior_normal[:] = self._tile_prior(problem, "normals.bin",
                                                   (h, w), (ph, pw), 3)
            cap = 0
            wx = wy = np.zeros(1, np.int32)
            if use_apd:
                prior_weak[:] = np.where(
                    valid, self._tile_prior(problem, "weak.bin", (h, w),
                                            (ph, pw), dtype=np.int32),
                    UNKNOWN)
                prior_conf[:] = self._tile_prior(problem, "confidence.bin",
                                                 (h, w), (ph, pw))
                wyy, wxx = np.nonzero(prior_weak == WEAK)
                cap = _bucket(len(wxx)) if len(wxx) else 0
                # the tile engine shards the weak list over the mesh
                cap = -(-cap // n) * n if cap else 0
                wx = np.zeros(max(cap, 1), np.int32)
                wy = np.zeros(max(cap, 1), np.int32)
                wx[:len(wxx)] = wxx
                wy[:len(wyy)] = wyy
            weak_valid = np.zeros(max(cap, 1), bool)
            if cap:
                weak_valid[:len(np.nonzero(prior_weak == WEAK)[0])] = True

            sampler_u8 = bool(params.sampler_u8)
            images_np = np.clip(np.round(np.stack(src_imgs)), 0, 255
                                ).astype(np.uint8) if sampler_u8 \
                else np.stack(src_imgs).astype(np.float32)
            ref_np = np.clip(np.round(ref_p), 0, 255).astype(np.uint8) \
                if sampler_u8 else ref_p.astype(np.float32)
            pass_cfg = PassStatic.from_params(
                params, nw_cap=cap if use_apd else 0,
                radius_budget=self.radius_budget,
                sweep_k=min(len(problem.src_image_ids), NUM_SAMPLES))
            step = build_tile_pass(mesh, pass_cfg,
                                   len(problem.src_image_ids), (ph, pw),
                                   (h, w))
            key = jax.random.PRNGKey(
                self.seed * 1000003 + problem.ref_image_id * 131
                + spec.iteration)
            tp = TileInputs(
                ref_image=jnp.asarray(ref_np),
                src_images=jnp.asarray(images_np),
                ref_cam=ref_cam, src_cams=scams,
                sa=jnp.asarray(sa), src_depths=jnp.asarray(
                    np.stack(src_depths)),
                prior_depth=jnp.asarray(prior_depth),
                prior_normal=jnp.asarray(prior_normal),
                prior_weak=jnp.asarray(prior_weak),
                prior_conf=jnp.asarray(prior_conf),
                valid=jnp.asarray(valid),
                weak_x=jnp.asarray(wx), weak_y=jnp.asarray(wy),
                weak_valid=jnp.asarray(weak_valid), key=key,
                dmin=jnp.float32(cam.depth_min * cfg.DEPTH_MIN_FACTOR),
                dmax=jnp.float32(cam.depth_max * cfg.DEPTH_MAX_FACTOR))
            depth, normal, weak, conf, _cost = step(
                tp, jnp.float32(params.ransac_threshold),
                jnp.int32(params.weak_peak_radius),
                jnp.float32(params.geom_factor))
            pm_ms = (time.time() - t0) * 1000
            persist_view_results(
                problem, spec, np.asarray(depth)[:h, :w],
                np.asarray(normal)[:h, :w],
                np.asarray(weak)[:h, :w],
                np.clip(np.asarray(conf)[:h, :w], 0, 255).astype(np.uint8),
                float(cam.depth_min * cfg.DEPTH_MIN_FACTOR),
                float(cam.depth_max * cfg.DEPTH_MAX_FACTOR), geom_or_apd,
                self.cache, show_medium_result=spec.show_medium_result)
            problem.used_time_ms += pm_ms
            print(f"Processed view {format_index(problem.ref_image_id)} "
                  f"iter {spec.iteration} TILED over {n} device(s): "
                  f"{pm_ms:.0f} ms", flush=True)

    def _tile_prior(self, problem: Problem, name: str, hw, phw,
                    channels: int = 0, dtype=np.float32) -> np.ndarray:
        mat = read_bin_mat(problem.result_folder / name, cache=self.cache)
        if mat.shape[:2] != hw:
            mat = resize_nearest(mat, hw)
        out = np.zeros(phw + ((channels,) if channels else ()), dtype)
        out[:hw[0], :hw[1]] = mat.astype(dtype)
        return out

    def run_pass(self, spec: cfg.PassSpec,
                 max_views_per_device: Optional[int] = None) -> None:
        """Run one pass for all views. `max_views_per_device` additionally
        caps the batch so each device runs at most that many views per
        program (the driver derives it from the per-stage execution-time
        estimate; None = memory-based batching only)."""
        cap = None
        if max_views_per_device is not None:
            cap = max_views_per_device * min(self._n_devices(),
                                             len(self.problems))
        for batch in self._batches(cap):
            self._run_pass_batch(spec, batch)

    def _run_pass_batch(self, spec: cfg.PassSpec,
                        problems: List[Problem]) -> None:
        import jax
        import jax.numpy as jnp
        from ..parallel.mesh import make_mesh
        from ..parallel.scene import ScenePassInputs, build_sharded_full_pass

        t0 = time.time()
        params = spec.params
        geom_or_apd = params.geom_consistency or params.use_apd
        use_apd = params.use_apd and params.state != "first_init"
        first_init = params.state == "first_init"
        rd = self._round_data(spec, problems)
        V = len(problems)
        Vp, ph, pw = rd.Vp, rd.ph, rd.pw

        prior_depth = np.zeros((Vp, ph, pw), np.float32)
        prior_normal = np.zeros((Vp, ph, pw, 3), np.float32)
        prior_weak = np.full((Vp, ph, pw), UNKNOWN, np.int32)
        prior_conf = np.ones((Vp, ph, pw), np.float32)
        sa = np.zeros((Vp, ph, pw), np.int32)
        probs = list(problems) + [problems[0]] * (Vp - V)

        def load_view_priors(i):
            p = probs[i]
            if not first_init:
                prior_depth[i] = self._load_prior(p, "depths.bin", rd)
                prior_normal[i] = self._load_prior(p, "normals.bin", rd)
            if use_apd:
                prior_weak[i] = np.where(
                    rd.valid, self._load_prior(p, "weak.bin", rd, np.int32),
                    UNKNOWN)
                prior_conf[i] = self._load_prior(p, "confidence.bin", rd)
                if params.use_sa:
                    sa_path = p.dense_folder / "sa_masks" / \
                        (format_index(p.ref_image_id) + ".bin")
                    if sa_path.exists():
                        mat = read_bin_mat(sa_path, cache=self.cache)
                        if mat.shape[:2] != (rd.h, rd.w):
                            mat = resize_nearest(mat, (rd.h, rd.w))
                        sa[i] = pad_to_multiple(mat.astype(np.int32), PAD_H,
                                                PAD_W, mode="constant")

        # host-side map loads dominate pass turnaround on large scans; the
        # loads are per-view independent (cache dict ops are GIL-atomic)
        with ThreadPoolExecutor(max_workers=8) as pool:
            list(pool.map(load_view_priors, range(Vp)))

        # ---- per-view weak compaction to a shared bucketed capacity -------
        cap = 0
        weak_lists = []
        if use_apd:
            for i in range(Vp):
                wy, wx = np.nonzero(prior_weak[i] == WEAK)
                weak_lists.append((wx, wy))
                cap = max(cap, len(wx))
            n_weak0 = len(weak_lists[0][0])
            print(f"Weak counts: max {cap}, view0 {n_weak0} / {ph * pw} = "
                  f"{n_weak0 / (ph * pw) * 100:.1f}%", flush=True)
            cap = _bucket(cap) if cap > 0 else 0
        weak_x = np.zeros((Vp, max(cap, 1)), np.int32)
        weak_y = np.zeros((Vp, max(cap, 1)), np.int32)
        weak_valid = np.zeros((Vp, max(cap, 1)), bool)
        if cap > 0:
            for i, (wx, wy) in enumerate(weak_lists):
                weak_x[i, :len(wx)] = wx
                weak_y[i, :len(wy)] = wy
                weak_valid[i, :len(wx)] = True

        keys = np.stack([
            np.asarray(jax.random.PRNGKey(
                self.seed * 1000003 + p.ref_image_id * 131 + spec.iteration))
            for p in probs]).astype(np.uint32)

        # prior depths of out-of-batch reference views (file interchange)
        ext_depth = np.zeros((rd.Ep, ph, pw), np.float32)
        if geom_or_apd and rd.ext_ids:
            by_ref = {p.ref_image_id: p for p in self.problems}
            for e, vid in enumerate(rd.ext_ids):
                ext_depth[e] = self._load_prior(by_ref[vid], "depths.bin", rd)

        # sweep_k must cover the max possible per-pixel selection count
        # (NUM_SAMPLES Monte-Carlo votes) — the traced pass cannot inspect
        # the actual max the way the serial engine's _sweep_view_bucket
        # does, so it takes the conservative capacity; prefer_view_slots
        # then decides slot-vs-all-views economics per table dtype
        from ..ops.selection import NUM_SAMPLES
        pass_cfg = PassStatic.from_params(
            params, nw_cap=cap if use_apd else 0,
            radius_budget=self.radius_budget,
            sweep_k=min(rd.S, NUM_SAMPLES))
        mesh = self.mesh if self.mesh is not None \
            else make_mesh(num_devices=rd.n_mesh)
        step = build_sharded_full_pass(
            mesh, pass_cfg, rd.S, (ph, pw), (rd.h, rd.w), geom_or_apd)

        scene = ScenePassInputs(
            images=rd.images, cam_K=rd.cam_K, cam_R=rd.cam_R,
            cam_t=rd.cam_t, cam_c=rd.cam_c, pair=rd.pair,
            ref_slot=rd.ref_slot, depth_slot=rd.depth_slot,
            dmin=rd.dmin, dmax=rd.dmax, valid=rd.valid,
            prior_depth=prior_depth, prior_normal=prior_normal,
            prior_weak=prior_weak, prior_conf=prior_conf, sa=sa,
            weak_x=weak_x, weak_y=weak_y, weak_valid=weak_valid, keys=keys,
            ext_depth=ext_depth)
        outs = step(scene, jnp.float32(params.ransac_threshold),
                    jnp.int32(params.weak_peak_radius),
                    jnp.float32(params.geom_factor))
        depth = np.asarray(outs.depth)
        normal = np.asarray(outs.normal)
        weak = np.asarray(outs.weak)
        conf = np.asarray(outs.confidence)
        pm_ms = (time.time() - t0) * 1000

        # dedupe tail-batch padding (duplicated problems share a ref id;
        # persist the first occurrence only)
        keep = []
        seen = set()
        for i in range(V):
            if problems[i].ref_image_id not in seen:
                seen.add(problems[i].ref_image_id)
                keep.append(i)

        def persist_one(i):
            p = problems[i]
            persist_view_results(
                p, spec, depth[i, :rd.h, :rd.w], normal[i, :rd.h, :rd.w],
                weak[i, :rd.h, :rd.w],
                np.clip(conf[i, :rd.h, :rd.w], 0, 255).astype(np.uint8),
                float(rd.dmin[i]), float(rd.dmax[i]), geom_or_apd,
                self.cache, show_medium_result=spec.show_medium_result)
            p.used_time_ms += pm_ms / len(keep)

        with ThreadPoolExecutor(max_workers=8) as pool:
            list(pool.map(persist_one, keep))
        print(f"Processed {V} views iter {spec.iteration} on "
              f"{mesh.devices.size} device(s): {pm_ms:.0f} ms "
              f"({pm_ms / V:.0f} ms/view)", flush=True)
