"""Global numeric configuration for multimodars_tpu.

The reference implementation (multimoda-rs, Rust) computes everything in f64.
TPUs have no native f64, so we split precision by role:

- Host-side geometry bookkeeping (centroids, areas, CSV data) stays float64
  numpy, matching the reference bit-for-bit where cheap.
- Device-side batched kernels (rotation search, Hausdorff sweeps) default to
  float32 on TPU and float64 on CPU.  mm-scale coordinates in f32 carry
  ~1e-6 mm rounding, far below the 1e-4 mm fidelity target; argmin decisions
  over the angle grid are robust to it because the cost landscape's local
  curvature near the optimum exceeds the noise floor by orders of magnitude.

IMPORT-TIME SIDE EFFECT (documented prominently): importing this package
enables ``jax_enable_x64`` for the whole process, because the reference's
f64 semantics are part of the API contract this library reproduces (CPU
runs must match the Rust implementation bit-for-bit).  The switch is
skipped when the application has already expressed a choice via the
``JAX_ENABLE_X64`` environment variable; device kernels pick their own
dtype through :data:`config.compute_dtype` regardless.
"""

from __future__ import annotations

import os

import jax

if "JAX_ENABLE_X64" not in os.environ:
    jax.config.update("jax_enable_x64", True)

# Persistent compilation cache: XLA compiles over a tunneled/remote backend
# can take tens of seconds per kernel; caching executables on disk makes
# every process after the first start warm.  Opt out with
# MMTPU_NO_COMPILE_CACHE=1 or point elsewhere with JAX_COMPILATION_CACHE_DIR.
# Host heap tuning (OPT-IN via MMTPU_HOST_MALLOC_TUNING=1): some virtualized
# hosts fault fresh anonymous pages extremely slowly (lazy snapshot
# restore), and glibc's default trim/mmap behaviour makes every large numpy
# temporary re-fault its pages.  With trimming off and mmap disabled for
# malloc, each page faults at most once per process.  MMTPU_PREFAULT_MB=N
# additionally touches an N MB scratch at import to absorb the cost
# upfront.  This mutates process-global allocator state, so it is never
# applied implicitly.
if os.environ.get("MMTPU_HOST_MALLOC_TUNING", "0") == "1":
    try:  # pragma: no cover - platform dependent
        import ctypes as _ctypes

        _libc = _ctypes.CDLL("libc.so.6", use_errno=True)
        _libc.mallopt(-1, 2**30)  # M_TRIM_THRESHOLD
        _libc.mallopt(-4, 0)  # M_MMAP_MAX
        _prefault_mb = int(os.environ.get("MMTPU_PREFAULT_MB", "0"))
        if _prefault_mb > 0:
            import numpy as _np

            _scratch = _np.empty(_prefault_mb * 1024 * 1024 // 8)
            _scratch.fill(0.0)
            del _scratch
    except Exception:
        pass

if os.environ.get("MMTPU_NO_COMPILE_CACHE", "0") != "1":
    try:
        _cache_dir = os.environ.get(
            "JAX_COMPILATION_CACHE_DIR",
            os.path.join(
                os.path.expanduser("~"), ".cache", "multimodars_tpu", "jax_cache"
            ),
        )
        os.makedirs(_cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", _cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:  # pragma: no cover - older jax without the knobs
        pass

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

# Honor JAX_PLATFORMS=cpu even when a device plugin ignores it.  The axon
# TPU image preimports jax from an interpreter-startup sitecustomize (with
# the login profile's JAX_PLATFORMS=axon), so by the time user code runs the
# jax_platforms config is already frozen at "axon,cpu" and re-exporting the
# env var is a no-op.  Re-assert the requested platform through
# ``jax.config.update`` (which wins over the preimport as long as no
# backend is live yet — true at import time) so subprocess tiers that
# request a CPU backend (tests, examples, notebooks, CI) never contend for
# a single-client TPU tunnel.  Fall back to pinning the default device if
# the platform list can no longer be changed.
_requested = os.environ.get("JAX_PLATFORMS", "").split(",")[0].strip().lower()
if _requested == "cpu":
    # Order matters: jax.default_backend() is itself a backend-initializing
    # call (it realizes the frozen 'axon,cpu' platform list and opens the
    # single-client TPU tunnel), after which the platform update silently
    # no-ops.  So update the platform list FIRST, unconditionally — it is
    # harmless when already cpu — and only then probe the backend; fall back
    # to the default-device pin if the switch did not take (backend was
    # already live before this module imported).
    try:
        jax.config.update("jax_platforms", "cpu")
    except Exception:  # pragma: no cover - older jax without the knob
        pass
    try:
        if jax.default_backend() != "cpu":  # pragma: no cover - late import
            jax.config.update("jax_default_device", jax.devices("cpu")[0])
    except Exception:  # pragma: no cover
        pass


def cpu_pinned() -> bool:
    """True when ``JAX_PLATFORMS`` requested the cpu platform.  The single
    source of truth for that check: plugins may register their device
    regardless (``jax.default_backend()`` can still report ``tpu``), so
    callers that enumerate devices (mesh builders, staging guards) must
    consult this instead of the backend string."""
    return _requested == "cpu"


def default_devices():
    """Devices a no-argument mesh builder should use: the CPU platform when
    the process is CPU-pinned (so a pinned subprocess never opens the
    single-client accelerator tunnel), else ``jax.devices()``."""
    if cpu_pinned():
        try:
            return jax.devices("cpu")
        except Exception:  # pragma: no cover
            pass
    return jax.devices()


def default_backend() -> str:
    try:
        return jax.default_backend()
    except Exception:  # pragma: no cover
        return "cpu"


def _initial_compute_dtype():
    env = os.environ.get("MMTPU_COMPUTE_DTYPE")
    if env:
        return jnp.dtype(env)
    return jnp.float32 if default_backend() == "tpu" else jnp.float64


class _Config:
    """Mutable runtime config (dtype of the batched device kernels)."""

    def __init__(self):
        self.compute_dtype = _initial_compute_dtype()
        # Host dtype used for the object data model / converters.
        self.host_dtype = np.float64

    def set_compute_dtype(self, dtype) -> None:
        self.compute_dtype = jnp.dtype(dtype)


config = _Config()
