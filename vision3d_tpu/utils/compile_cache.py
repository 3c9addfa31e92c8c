"""Persistent XLA compilation cache for the CLI entry points.

Cold compiles of the full-geometry SECOND graph run minutes (CPU and TPU
alike); with the cache enabled a same-shape process start skips XLA
entirely. bench.py already does this inline — the CLIs share this helper
so train -> eval -> crosscheck pipelines (tools/run_ap_loop.sh) pay the
compile once across processes.
"""

import os

import jax

DEFAULT_DIR = os.environ.get(
    "VISION3D_XLA_CACHE", os.path.join("/tmp", "vision3d_xla_cache")
)


def enable_persistent_cache(path: str | None = None) -> str:
    path = path or DEFAULT_DIR
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    return path
