"""Persistent XLA compilation cache for entry points.

Remote-attached TPU backends pay their compiles through an RPC whose
latency varies by orders of magnitude (this dev tunnel: 20 s to 5+ min for
the same graph), and every fresh process pays again.  JAX's persistent
compilation cache keys the serialized executable on (backend, HLO, flags),
so second processes reload in milliseconds — the difference between a
~500 s and a ~200 s UCB-100 CLI run here.

The library never touches global config from module import; entry points
(CLI, bench tools) opt in by calling `enable_persistent_cache()`.  An
explicit `JAX_COMPILATION_CACHE_DIR` (env or absl flag) always wins — we
only fill in a default when nothing is configured.
"""

from __future__ import annotations

import os

DEFAULT_DIR = os.path.join(
    os.path.expanduser("~"), ".cache", "blindshadowremoval_tpu", "xla")


def enable_persistent_cache(path: str | None = None) -> str:
    """Point JAX's persistent compilation cache at `path` (default:
    ~/.cache/blindshadowremoval_tpu/xla) unless the user already configured
    one.  Returns the directory in effect.  Safe to call before or after
    backends initialize; callers must invoke this before the first jit
    compile for it to matter."""
    import jax

    if os.environ.get("JAX_COMPILATION_CACHE_DIR"):
        return os.environ["JAX_COMPILATION_CACHE_DIR"]
    current = jax.config.jax_compilation_cache_dir
    if current:
        return current
    cache_dir = path or DEFAULT_DIR
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    return cache_dir
