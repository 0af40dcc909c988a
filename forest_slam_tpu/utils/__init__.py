"""Shared utilities (filters, corruption, metrics, runtime setup)."""


def tpu_backend() -> bool:
    """True when the default backend is a TPU. PJRT plugins can register
    under a vendor platform name while still exposing TPU devices (the
    axon tunnel plugin does) — every "should I take the Pallas/TPU fast
    path" gate must use this, not ``default_backend() == "tpu"``."""
    import jax

    if jax.default_backend() in ("tpu", "axon"):
        return True
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:
        return False


def enable_compilation_cache(path: str = "/root/.cache/jax_fs") -> None:
    """Point jax at the persistent compilation cache. A cold process pays
    minutes compiling the renderer + pipeline on the tunneled TPU; every
    entry script (bench.py, scripts/*) calls this before first trace.

    The directory is suffixed per platform: CPU AOT executables embed the
    COMPILE machine's ISA features, and on this setup the tunneled-TPU
    host's CPU supports AMX/AVX512 extensions the local CPU lacks — a
    shared directory made local CPU runs load remote-compiled artifacts
    (observed cpu_aot_loader SIGILL warnings)."""
    import os

    import jax

    try:
        plat = os.environ.get("JAX_PLATFORMS", "") or "default"
        jax.config.update(
            "jax_compilation_cache_dir", f"{path}_{plat.split(',')[0]}"
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
