"""Host platform plumbing: forcing the hermetic N-virtual-device CPU mesh.

Some environments (the axon TPU tunnel) register a PJRT plugin from
``sitecustomize`` at interpreter start and pin ``jax_platforms`` before user
code runs, so env vars set later are ignored. This helper re-selects the CPU
backend at runtime — needed by unit tests and the multi-chip dryrun, which
validate sharding on ``--xla_force_host_platform_device_count`` virtual
devices.
"""

from __future__ import annotations

import os
from typing import Optional


def cpu_env(n: int = 8) -> dict:
    """Environment for a fresh process with ``n`` virtual CPU devices."""
    env = dict(os.environ)
    flags = env.get("XLA_FLAGS", "")
    want = f"--xla_force_host_platform_device_count={n}"
    if "xla_force_host_platform_device_count" not in flags:
        env["XLA_FLAGS"] = (flags + " " + want).strip()
    env["JAX_PLATFORMS"] = "cpu"
    # disable the axon sitecustomize hook entirely (it pins the platform and
    # may initialize backends at interpreter start, before any user code)
    env["PALLAS_AXON_POOL_IPS"] = ""
    return env


def force_cpu_devices(n: int = 8, reexec: bool = True) -> None:
    """Ensure jax.devices() is ≥ n CPU devices.

    Tries an in-process backend re-selection first (works when no backend
    has been initialized yet). If the XLA process-level flags were already
    parsed — e.g. the axon plugin initialized its backend from
    sitecustomize — re-execs the current process with a corrected
    environment (guarded against loops by _ALAYA_FORCED_CPU).
    """
    want = f"--xla_force_host_platform_device_count={n}"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (flags + " " + want).strip()
    os.environ["JAX_PLATFORMS"] = "cpu"

    import jax

    jax.config.update("jax_platforms", "cpu")
    try:
        devs = jax.devices()
    except RuntimeError:
        devs = []
    if not (devs and devs[0].platform == "cpu" and len(devs) >= n):
        from jax.extend.backend import clear_backends

        clear_backends()
        devs = jax.devices()
    if devs[0].platform == "cpu" and len(devs) >= n:
        return
    import sys

    # can't re-exec stdin-driven scripts (python -): argv can't be replayed
    if (reexec and not os.environ.get("_ALAYA_FORCED_CPU")
            and sys.argv and sys.argv[0] not in ("-", "", "-c")):
        env = cpu_env(n)
        env["_ALAYA_FORCED_CPU"] = "1"
        os.execve(sys.executable, [sys.executable] + sys.argv, env)
    raise RuntimeError(
        f"could not force {n} CPU devices (got {devs}); set "
        f"PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu XLA_FLAGS='{want}' "
        f"in the environment instead")


def enable_compile_cache(path: Optional[str] = None) -> None:
    """Persistent compilation cache — first-compile through the TPU tunnel
    runs ~30-60s per program, so caching across runs is a big win."""
    import jax

    if path is None:
        path = os.environ.get(
            "ALAYA_CACHE_DIR",
            os.path.join(os.path.dirname(os.path.dirname(
                os.path.dirname(os.path.abspath(__file__)))), ".jax_cache"))
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:
        pass
