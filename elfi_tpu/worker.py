"""Cluster worker entry point: ``python -m elfi_tpu.worker HOST:PORT``.

Attach this process (from any machine that can reach the master) to a
running :class:`~elfi_tpu.parallel.cluster.ClusterBackend`; start and
stop workers at any time — the master reassigns work elastically.
"""

import os
import sys


def main(argv=None):
    argv = sys.argv[1:] if argv is None else argv
    if len(argv) != 1 or ":" not in argv[0]:
        print("usage: python -m elfi_tpu.worker HOST:PORT/AUTHKEY",
              file=sys.stderr)
        return 2
    # workers compute on host CPU; accelerators aren't shareable
    os.environ.setdefault("JAX_PLATFORMS", "cpu")
    # never load a foreign persistent compile cache (machine-feature
    # mismatches in XLA:CPU AOT entries can SIGILL the worker)
    os.environ["JAX_COMPILATION_CACHE_DIR"] = ""
    import jax
    try:
        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_compilation_cache_dir", None)
    except Exception:
        pass
    from elfi_tpu.parallel.cluster import worker_main
    cache = int(os.environ.get("ELFI_TPU_WORKER_PROGRAM_CACHE", "32"))
    worker_main(argv[0], program_cache_size=cache)
    return 0


if __name__ == "__main__":
    sys.exit(main())
