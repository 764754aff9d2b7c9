"""apde_mvs_tpu — a TPU-native PatchMatch multi-view-stereo framework.

A from-scratch JAX/XLA re-architecture of the adaptive-patch-deformation
PatchMatch MVS pipeline (reference: yuki-inaho/APDe-MVS, CUDA/C++). The compute
path is XLA-gather-based JAX (u8 quad-table sampling, cost kernels over
checkerboard-compacted pixel sets, `lax` control flow, deterministic key-split
PRNG) — Pallas alternatives for the sampling hot loop were built and measured
slower on this stack (PERF_NOTES; `ops/pallas/sampler.py` is kept as the
measured close-out). Scale-out is a `jax.sharding` mesh over views; the host
runtime (I/O codecs, fusion inner loops, thread pool) has native C twins.

Layering (top to bottom), mirroring the reference's capability surface
(see SURVEY.md §1-2):

- ``tools``     evaluation / result collection / visualization exports
- ``cli``       batch scheduler (run.py parity) + per-scan engine CLI (APD parity)
- ``datasets``  COLMAP->MVSNet conversion, scan layout normalization, SAM masks
- ``pipeline``  multi-scale driver, per-view PatchMatch, fusion
- ``parallel``  device mesh, view sharding, multi-chip depth exchange
- ``ops``       PatchMatch compute ops (cost, propagation, anchors, classify)
- ``core``      camera geometry, image sampling, checkerboard layout
- ``io``        binary-mat / camera / pair / PLY / PFM codecs (reference ABI)
"""

__version__ = "0.1.0"
