"""Platform/runtime knobs."""

from __future__ import annotations

import os


def enable_compilation_cache(path: str = "~/.cache/apde_mvs_tpu_xla") -> None:
    """Persistent XLA compilation cache: the engine jits one kernel set per
    (resolution, view-count, flag) configuration, which all views and scans of
    a dataset share — caching across processes removes recompiles entirely
    after the first run."""
    import jax

    cache_dir = os.path.expanduser(path)
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    try:
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except AttributeError:
        pass


def bind_device(index: int) -> None:
    """Pin this process's computations to one local device.

    The scan scheduler launches `device_num x work_num` engine processes and
    passes each a device slot; binding makes those slots real on a multi-chip
    host instead of piling every process onto device 0 (reference mechanism:
    cudaSetDevice(gpu_index), main.cpp:264). Out-of-range indices wrap, so
    over-subscribing workers degrades gracefully like the reference's slot
    arithmetic.
    """
    import jax

    devices = jax.local_devices()
    jax.config.update("jax_default_device", devices[index % len(devices)])


def profile_trace(out_dir):
    """Context manager: capture a JAX/XLA profiler trace (TensorBoard +
    Perfetto format) for the enclosed work. TPU-native replacement for the
    reference's wall-clock-only tracing (SURVEY §5.1; main.cpp:151-161) —
    per-op device timelines instead of per-view totals. View with
    `tensorboard --logdir <out_dir>` or ui.perfetto.dev.
    """
    import contextlib

    import jax

    @contextlib.contextmanager
    def _trace():
        path = os.path.expanduser(out_dir)
        os.makedirs(path, exist_ok=True)
        jax.profiler.start_trace(path)
        try:
            yield
        finally:
            jax.profiler.stop_trace()
    return _trace()
