"""Persistent XLA executable cache for veloci_tpu entry points.

TPU compiles are the dominant cold-start cost: a banded Mosaic sweep
kernel takes minutes to compile, and a serving process touches a handful
of them (one per dictionary length-window width) plus dozens of fused
search programs. JAX's persistent compilation cache serialises compiled
executables to disk keyed by (HLO, backend, flags), so every process
after the first deserialises in ~100 ms instead of recompiling — the
standard deployment posture for TPU serving fleets (one warm job
populates the cache; replicas start warm).

Opt-out with VELOCI_COMPILE_CACHE=0; relocate with
VELOCI_COMPILE_CACHE_DIR. The default directory lives inside the repo
(``.jax_cache``, gitignored) so benchmark reruns on the same checkout hit
it. Called by bench.py, the CLI, and the tools/ scripts before the first
jax dispatch; safe to call multiple times.

Reference parity note: the reference engine (CUDA/Rust) has no compile
step at all — persisting executables is how a jit-compiled framework
meets its cold-start bar (BASELINE.md cold-start rows).
"""

from __future__ import annotations

import os

_enabled_path: str | None = None


def enable_compile_cache(path: str | None = None) -> str | None:
    """Point JAX's persistent compilation cache at ``path`` and return it
    (None when disabled via VELOCI_COMPILE_CACHE=0 or when the directory
    cannot be created). Idempotent."""
    global _enabled_path
    if os.environ.get("VELOCI_COMPILE_CACHE", "1") == "0":
        return None
    if _enabled_path is not None:
        return _enabled_path
    if path is None:
        path = os.environ.get("VELOCI_COMPILE_CACHE_DIR") or os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            ".jax_cache",
        )
    try:
        os.makedirs(path, exist_ok=True)
    except OSError:
        return None
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", path)
    except Exception:
        return None
    # cache anything that took >=1s to compile (the default threshold
    # skips sub-second compiles, which is the right trade here too)
    for knob, val in (
        ("jax_persistent_cache_min_compile_time_secs", 1.0),
        # single-chip + virtual-mesh runs both benefit; 0 disables the
        # min-process guard some versions apply to multi-host setups
        ("jax_persistent_cache_min_entry_size_bytes", 0),
    ):
        try:
            jax.config.update(knob, val)
        except Exception:
            pass  # knob name varies across jax versions; best-effort
    _enabled_path = path
    return path
