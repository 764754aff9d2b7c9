"""Per-scan engine CLI — the `APD` binary equivalent (reference:
main.cpp:7-41, boost::program_options flags reproduced 1:1).

Usage:
    python -m apde_mvs_tpu.cli.apd --dense_folder <scan> [--dataset DTU] ...
"""

from __future__ import annotations

import argparse
import sys


def _bool(v: str) -> bool:
    return str(v).lower() in ("1", "true", "yes", "on")


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="apd", description="TPU-native APD engine")
    p.add_argument("--dense_folder", "-d", required=True,
                   help="path to dense folder")
    p.add_argument("--gpu_index", "-g", type=int, default=0,
                   help="local device slot this engine process binds to "
                        "(reference: cudaSetDevice, main.cpp:264)")
    p.add_argument("--dataset", "-D", default="DTU",
                   help="dataset name, DTU, ETH3D, TaT_a, TaT_i or General")
    p.add_argument("--only_fuse", "-f", type=_bool, default=False)
    p.add_argument("--no_fuse", "-F", type=_bool, default=False)
    p.add_argument("--memory_cache", "-m", type=_bool, default=True)
    p.add_argument("--use_sa", "-s", type=_bool, default=True)
    p.add_argument("--use_impetus", "-i", type=_bool, default=True)
    p.add_argument("--weak_filter", "-w", type=_bool, default=True)
    p.add_argument("--flush", type=_bool, default=False)
    p.add_argument("--export_anchor", "-n", type=_bool, default=False)
    p.add_argument("--export_curve", "-r", type=_bool, default=False)
    p.add_argument("--export_color", "-c", type=_bool, default=True)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--pyramid_base", type=int, default=800)
    p.add_argument("--views_parallel", type=str, default="auto",
                   choices=["auto", "true", "false"],
                   help="shard every view's pass over all local devices "
                        "(auto: on when >1 device is attached)")
    p.add_argument("--profile_dir", type=str, default=None,
                   help="capture a JAX profiler trace of the scan into this "
                        "directory (TensorBoard/Perfetto)")
    p.add_argument("--view_batch", type=int, default=None,
                   help="cap reference views per SPMD batch in the "
                        "view-parallel engine (bounds the replicated image "
                        "table for very large scans; default: whole scan)")
    p.add_argument("--fuse_shard", type=str, default=None,
                   help="distributed fusion: 'i,n' fuses ref views i mod n "
                        "into a partial PLY")
    p.add_argument("--merge_fusion", type=int, default=None,
                   help="merge N partial fusion PLYs into APD.ply and exit")
    p.add_argument("--start_iteration", type=int, default=0,
                   help="skip schedule passes below this iteration index "
                        "(coarse mid-scan recovery: state reloads from the "
                        "per-view bins exactly as any non-first pass does)")
    p.add_argument("--sampler", type=str, default="u8",
                   choices=["u8", "f32"],
                   help="source sampling table dtype: u8 quads (fast, "
                        "texture-grade precision) or f32 quads (exact "
                        "oracle)")
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    only_fuse = args.only_fuse
    use_memory_cache = args.memory_cache and not only_fuse
    flush = args.flush or args.no_fuse
    print("========================== Config ==========================")
    for k, v in sorted(vars(args).items()):
        print(f"{k:14s}: {v}")
    print("============================================================")

    from ..core.platform import bind_device, enable_compilation_cache
    from ..pipeline.driver import run_scan

    enable_compilation_cache()
    bind_device(args.gpu_index)

    if args.merge_fusion:
        from ..pipeline.fusion import merge_fusion_shards
        merge_fusion_shards(args.dense_folder, "APD.ply", args.merge_fusion,
                            export_color=args.export_color)
        return 0

    fuse_shard = None
    if args.fuse_shard:
        i, n = (int(v) for v in args.fuse_shard.split(","))
        fuse_shard = (i, n)

    import contextlib
    prof = contextlib.nullcontext()
    if args.profile_dir:
        from ..core.platform import profile_trace
        prof = profile_trace(args.profile_dir)
    with prof:
        run_scan(
            args.dense_folder, dataset=args.dataset,
            only_fuse=only_fuse, no_fuse=args.no_fuse,
            use_memory_cache=use_memory_cache, use_sa=args.use_sa,
            use_impetus=args.use_impetus, weak_filter=args.weak_filter,
            flush=flush, export_anchor=args.export_anchor,
            export_curve=args.export_curve, export_color=args.export_color,
            seed=args.seed, pyramid_base=args.pyramid_base,
            fuse_shard=fuse_shard,
            views_parallel={"auto": None, "true": True,
                            "false": False}[args.views_parallel],
            view_batch=args.view_batch,
            sampler_u8=(args.sampler == "u8"),
            start_iteration=args.start_iteration)
    return 0


if __name__ == "__main__":
    sys.exit(main())
