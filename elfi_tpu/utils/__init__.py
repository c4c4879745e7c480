"""Small shared utilities (reference ``elfi/utils.py``)."""

from __future__ import annotations

import numpy as np

__all__ = ["get_sub_seed", "random_seed", "is_array", "observed_name",
           "setup_performance_cache"]


def setup_performance_cache(cache_dir=".jax_cache", min_compile_secs=0.5):
    """Enable the persistent XLA compilation cache and strip caller-stack
    debug locations from lowered programs.

    The location stripping matters: Mosaic/pallas payloads embed source
    locations of the CALLING context, so structurally identical programs
    built from different call sites produce different cache keys and
    recompile (tens of seconds each on a remote-compile setup).

    The cache lives in a PER-PLATFORM subdirectory: XLA:CPU AOT entries
    embed the compiling process's CPU feature flags, and a TPU-attached
    process detects different flags than a pure-CPU one on the same box —
    mixing their entries in one directory SIGSEGVs whichever process
    loads the other's executables (observed: segfault inside
    ``compilation_cache.get_executable_and_time`` mid-test-suite)."""
    import os

    import jax
    cache_dir = os.path.join(cache_dir, jax.default_backend())
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs",
                      min_compile_secs)
    jax.config.update("jax_traceback_in_locations_limit", 0)


def get_sub_seed(seed, sub_seed_index, high=2**31):
    """Return a deterministic sub-seed for ``(seed, index)``.

    The reference rejection-samples distinct uint32s from a master-seeded
    RandomState (``elfi/utils.py:71-127``); we use ``np.random.SeedSequence``
    spawn keys — the same replayability/uniqueness guarantee, O(1) per index.
    """
    ss = np.random.SeedSequence(entropy=int(seed),
                                spawn_key=(int(sub_seed_index),))
    return int(ss.generate_state(1, np.uint64)[0] % high)


def random_seed():
    """Fresh seed from OS entropy (reference ``elfi/utils.py:25-33``)."""
    return int(np.random.SeedSequence().generate_state(1, np.uint64)[0]
               % (2**31))


def is_array(x):
    return isinstance(x, np.ndarray) or hasattr(x, "__array__")


def observed_name(name):
    return f"_{name}_observed"

from . import profiling  # noqa: F401,E402
