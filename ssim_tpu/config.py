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
