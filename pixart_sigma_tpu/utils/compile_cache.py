"""Persistent XLA compilation cache.

Remote-TPU compiles in this environment take minutes for the 28-layer model;
a persistent on-disk cache makes every recompile of an unchanged program
instant across processes (the TPU analogue of the reference relying on eager
torch never compiling at all).
"""

from __future__ import annotations

import os

import jax

_DEFAULT_DIR = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(__file__))), ".jax_cache")


def enable_compilation_cache(cache_dir: str | None = None) -> None:
    cache_dir = cache_dir or os.environ.get("PIXART_JAX_CACHE", _DEFAULT_DIR)
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
