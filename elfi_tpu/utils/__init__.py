"""Small shared utilities (reference ``elfi/utils.py``)."""

from __future__ import annotations

import numpy as np

__all__ = ["get_sub_seed", "random_seed", "is_array", "observed_name"]


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
