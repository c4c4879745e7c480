"""Library-wide numeric policy, applied at package import.

Statistical numerics beat the last % of MXU throughput everywhere in
this library: the TPU default feeds matmuls bf16 inputs (~4e-3 relative
error per dot), which corrupted GP Cholesky factors by 5-11% and
collapsed predictive variances to the clip floor (see
``methods/bo/gp._mm_highest`` for the measured failure and
``CLAUDE.md`` for the incident record).  No hot path here runs large
matmuls — simulators/summaries/distances are elementwise, the GP is
latency-bound at cap<=512 — so full-float32 matmuls are a pure win.

This is a pure config write: it must NOT (and does not) initialise a
JAX backend at import time (regression test in
``tests/unit/test_model.py``).
"""

import jax

jax.config.update("jax_default_matmul_precision", "highest")
