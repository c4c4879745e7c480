"""TPU-native compute ops: distributions, distances, top-k selection."""

from . import distances, distributions, topk  # noqa: F401
