"""Model extensions: joint prior over parameters.

Reference: ``elfi/model/extensions.py:120-245`` (ModelPrior) and the
augmenter graph rewrites (``elfi/model/augmenter.py``).  Instead of grafting
pdf/logpdf nodes into the graph and interpreting them, we trace the prior
sub-DAG directly into jitted ``rvs`` / ``logpdf`` / ``gradient_logpdf``
closures — the gradient comes from ``jax.grad`` rather than the reference's
3-point numerical differences (``methods/utils.py:275-314``).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from ..compile.compiler import compile_program
from ..model.model import node_uid
from ..ops.distributions import Distribution

__all__ = ["ModelPrior", "ScipyLikeDistribution"]

# API parity alias: elfi.Distribution == ScipyLikeDistribution in reference
ScipyLikeDistribution = Distribution


class ModelPrior:
    """Joint prior distribution over a model's parameter nodes."""

    def __init__(self, model, parameter_names=None):
        model = model.model if hasattr(model, "model") and not hasattr(
            model, "dag") else model
        self.model = model.copy()
        self.parameter_names = list(parameter_names
                                    or self.model.parameter_names)
        self.dim = len(self.parameter_names)
        self._logpdf_jit = None
        self._build()

    def _build(self):
        dag = self.model.dag
        order = dag.topological_order(self.parameter_names)
        self._order = order
        self._states = {n: dag.get_state(n) for n in order}
        self._parents = {n: dag.parents(n) for n in order}
        # scipy-adapter priors evaluate eagerly on host; traced/fused
        # method paths are unavailable for them
        self._has_host = any(
            st["kind"] == "rv" and getattr(st["distribution"], "host", False)
            for st in self._states.values())

    # -- sampling ---------------------------------------------------------------
    def rvs(self, size=1, key=None, random_state=None, seed=None):
        """Draw (size, dim) from the joint prior."""
        if key is None:
            if seed is None:
                if random_state is not None:  # numpy compat path
                    seed = int(random_state.randint(0, 2**31 - 1))
                else:
                    seed = int(np.random.randint(0, 2**31 - 1))
            key = jax.random.key(seed)
        prog = compile_program(self.model, tuple(self.parameter_names))
        out = prog.run(key, 0, {}, batch_size=int(size))
        cols = [np.asarray(out[n]).reshape(size, -1)
                for n in self.parameter_names]
        arr = np.column_stack(cols)
        return arr if arr.shape[1] > 1 else arr  # always 2d (n, dim)

    def box(self):
        """``(lo, hi, logconst)`` numpy arrays/float if the joint prior is
        an independent uniform box over the parameters, else ``None``.

        A box prior is pure DATA (bounds + a normalisation constant), so
        samplers can target one stable module-level log-density with the
        box passed as jit arguments — one compiled NUTS program serves
        every fit and every model instance, instead of a per-closure
        recompile.  Non-uniform or hierarchical priors return ``None`` and
        take the general traced-closure path."""
        lo = {}
        hi = {}
        logconst = 0.0
        pset = set(self.parameter_names)
        consts = {}
        for name in self._order:
            st = self._states[name]
            if st["kind"] == "constant":
                consts[name] = st["value"]
                continue
            if st["kind"] != "rv" or name not in pset:
                return None
            if getattr(st["distribution"], "name", None) != "uniform":
                return None
            pv = []
            for p in self._parents[name]:
                v = consts.get(p)
                if v is None or np.ndim(v) != 0:
                    return None
                pv.append(float(v))
            loc = pv[0] if len(pv) > 0 else 0.0
            scale = pv[1] if len(pv) > 1 else 1.0
            if not (scale > 0.0):
                return None
            lo[name] = loc
            hi[name] = loc + scale
            logconst -= float(np.log(scale))
        if set(lo) != pset:
            return None
        return (np.asarray([lo[n] for n in self.parameter_names],
                           np.float32),
                np.asarray([hi[n] for n in self.parameter_names],
                           np.float32),
                float(logconst))

    # -- density ------------------------------------------------------------------
    def _logpdf_traceable(self):
        order = self._order
        states = self._states
        parents = self._parents
        pnames = self.parameter_names
        pindex = {n: i for i, n in enumerate(pnames)}

        def fn(x):  # x: (n, dim)
            vals = {}
            logp = jnp.zeros(x.shape[0])
            for name in order:
                st = states[name]
                kind = st["kind"]
                if kind == "constant":
                    vals[name] = st["value"]
                elif kind == "rv":
                    if name not in pindex:
                        raise ValueError(
                            f"Prior density requires all stochastic ancestors "
                            f"of parameters to be parameters; {name!r} is not.")
                    pv = [vals[p] for p in parents[name]]
                    xi = x[:, pindex[name]]
                    vals[name] = xi
                    logp = logp + st["distribution"].logpdf(xi, *pv)
                elif kind in ("operation", "summary"):
                    pv = [vals[p] for p in parents[name]]
                    vals[name] = st["op"](*pv)
                else:
                    raise ValueError(
                        f"Unsupported node kind {kind!r} in prior subgraph")
            return logp

        return fn

    def traceable_logpdf(self):
        """Traceable ``x (n, dim) -> (n,)`` joint log-prior for embedding in
        jitted samplers/acquisitions."""
        if self._has_host:
            raise ValueError(
                "The prior contains host-path (scipy-adapter) "
                "distributions, which cannot be traced into jitted device "
                "programs. Use JAX-native distributions (or an "
                "elfi_tpu.Distribution subclass) for methods that fuse "
                "the prior on device.")
        return self._logpdf_traceable()

    def logpdf(self, x):
        if self._has_host:
            # eager host evaluation (scipy densities are numpy callables)
            fn = self._logpdf_traceable()
            x = np.atleast_2d(np.asarray(x, np.float64))
            lp = np.asarray(fn(x))
            return lp.squeeze() if x.shape[0] == 1 else lp
        if self._logpdf_jit is None:
            self._logpdf_jit = jax.jit(self._logpdf_traceable())
        x = jnp.atleast_2d(jnp.asarray(x, jnp.float32))
        return np.asarray(self._logpdf_jit(x)).squeeze() \
            if x.shape[0] == 1 else np.asarray(self._logpdf_jit(x))

    def pdf(self, x):
        return np.exp(self.logpdf(x))

    def gradient_logpdf(self, x):
        """(n, dim) gradient of the joint log-prior via autodiff (host
        priors fall back to numerical differences)."""
        if self._has_host:
            x = np.atleast_2d(np.asarray(x, np.float64))
            g = np.stack([self.numerical_gradient_logpdf(row) for row in x])
            g = g.reshape(x.shape)
            return np.where(np.isfinite(g), g, 0.0)
        fn = self._logpdf_traceable()
        x = jnp.atleast_2d(jnp.asarray(x, jnp.float32))
        g = jax.jit(jax.grad(lambda xx: jnp.sum(fn(xx))))(x)
        g = np.asarray(g)
        # match reference behaviour: zero (not nan) outside support
        return np.where(np.isfinite(g), g, 0.0)

    def numerical_gradient_logpdf(self, x):
        from ..methods.utils import numgrad
        return numgrad(lambda xx: float(np.sum(self.logpdf(xx[None]))),
                       np.asarray(x))
