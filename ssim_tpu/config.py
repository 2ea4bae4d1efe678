"""Runtime configuration.

The reference's config surface is compile-time only: CMake options ->
preprocessor defines (RMGR_SSIM_USE_DOUBLE, RMGR_SSIM_NO_OPENMP,
CMakeLists.txt:53-57) plus header-overridable knobs
(RMGR_SSIM_CACHE_LINE_SIZE etc., src/ssim.cpp:46-52). A JAX framework
reconfigures at trace time instead, so the equivalents are a small
dataclass + environment variables:

| reference                    | ssim_tpu                               |
|------------------------------|----------------------------------------|
| RMGR_SSIM_USE_DOUBLE         | precision="f64" arg / SSIM_TPU_PRECISION |
| Implementation enum override | impl= arg / SSIM_TPU_IMPL              |
| tile/cache-line knobs        | max_tile_h / max_tile_w (Pallas tiles) |
| RMGR_SSIM_NO_OPENMP          | n/a (host backend threads via OMP_NUM_THREADS) |

New surface: `enable_compile_cache()` turns on JAX's persistent
compilation cache (SSIM_TPU_COMPILE_CACHE overrides the directory, or
set it to "0" to disable) — the eager CLI pays a fresh XLA/Mosaic
compile per process otherwise (~10-60 s on TPU; warm-cache runs load in
seconds). The reference has no analogue: its compile cost is paid once
at library build time, ours at trace time.
"""

import dataclasses
import os
from typing import Optional


@dataclasses.dataclass
class Config:
    """Process-wide defaults, overridable per-call via API kwargs."""

    #: Default implementation ("auto", "xla", "pallas", "reference", "host").
    impl: str = "auto"
    #: Default pixel precision ("f32" or "f64").
    precision: str = "f32"
    #: Pallas tile overrides (None = tuned defaults in ops/ssim_pallas.py).
    max_tile_h: Optional[int] = None
    max_tile_w: Optional[int] = None

    @classmethod
    def from_env(cls) -> "Config":
        def _int(name):
            v = os.environ.get(name)
            return int(v) if v else None

        return cls(
            impl=os.environ.get("SSIM_TPU_IMPL", "auto"),
            precision=os.environ.get("SSIM_TPU_PRECISION", "f32"),
            max_tile_h=_int("SSIM_TPU_TILE_H"),
            max_tile_w=_int("SSIM_TPU_TILE_W"),
        )


_config: Optional[Config] = None


def get_config() -> Config:
    global _config
    if _config is None:
        _config = Config.from_env()
    return _config


def set_config(cfg: Config) -> None:
    global _config
    _config = cfg


def enable_compile_cache() -> Optional[str]:
    """Enable JAX's persistent compilation cache (idempotent, best-effort).

    Returns the cache directory, or None when disabled via
    SSIM_TPU_COMPILE_CACHE=0 or when the directory isn't usable (an
    unwritable install never breaks callers — they just recompile).
    Used by the CLI so repeat invocations skip the per-process
    XLA/Mosaic compile.

    Default location: `<source checkout>/.cache/xla_cache` when running
    from a source tree (pyproject.toml present), else the per-user
    `~/.cache/ssim_tpu/xla_cache` (never inside site-packages).
    """
    choice = os.environ.get("SSIM_TPU_COMPILE_CACHE", "")
    if choice == "0":
        return None
    if choice:
        cache_dir = choice
    else:
        pkg_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        if os.path.isfile(os.path.join(pkg_root, "pyproject.toml")):
            cache_dir = os.path.join(pkg_root, ".cache", "xla_cache")
        else:
            cache_dir = os.path.join(
                os.path.expanduser("~"), ".cache", "ssim_tpu", "xla_cache"
            )
    try:
        import jax

        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        # Cache everything, including fast compilations (the default only
        # persists compilations above a time threshold).
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:
        return None  # degrade to no cache, never break the caller
    return cache_dir
