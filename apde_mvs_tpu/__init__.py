"""apde_mvs_tpu — a TPU-native PatchMatch multi-view-stereo framework.

A from-scratch JAX/XLA/Pallas re-architecture of the adaptive-patch-deformation
PatchMatch MVS pipeline (reference: yuki-inaho/APDe-MVS, CUDA/C++). The compute
path is pure JAX (gather-based cost kernels over checkerboard-compacted pixel
sets, `lax` control flow, deterministic key-split PRNG) with Pallas kernels for
the hot NCC/propagation ops; scale-out is a `jax.sharding` mesh over views.

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
