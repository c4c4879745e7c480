"""DAG -> XLA program compiler.

Replaces the reference's five graph-rewriting compiler passes + per-batch
loader passes + interpreting executor (``elfi/compiler.py``, ``loader.py``,
``executor.py``) with a single trace: the declared model is topologically
sorted once and unrolled into a pure JAX function

    ``fn(master_key, batch_index, overrides) -> {output: (batch, ...)}``

which XLA jit-compiles (per static ``batch_size``) and fuses end-to-end.
The reference's compiler concepts map as follows:

- OutputCompiler/ReduceCompiler (``compiler.py:32,213``): the trace only
  walks ancestors of the requested outputs.
- ObservedCompiler (``compiler.py:74``): observed values are evaluated
  eagerly at compile time and baked into the program as constants.
- AdditionalNodesCompiler/RandomStateCompiler (``compiler.py:158,187``):
  ``batch_size`` is a static closure value; RNG is per-node
  ``fold_in(fold_in(master_key, batch_index), node_uid)`` — replayable like
  the reference sub-seed scheme (``elfi/utils.py:71-127``) but O(1).

Graphs containing ``host=True`` nodes (external simulators, numpy-only ops)
run through the host executor instead — the same topological walk, executed
eagerly with numpy ``RandomState`` handed to host ops.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from ..model.model import node_uid

__all__ = ["compile_program", "CompiledProgram"]


def _adaptive_versions(model):
    """(name, version) of every adaptive-distance holder in the model —
    part of every program cache key, because the holders are SHARED
    across model copies and mutate without bumping this copy's
    revision."""
    return tuple(sorted(
        (n, st["_adaptive_state"].get("version", 0))
        for n, st in model.dag.nodes.items() if st.get("adaptive")))


def compile_program(model, outputs, override_names=()):
    """Return a (cached) :class:`CompiledProgram` for ``outputs`` of
    ``model`` with the given set of overridable node names."""
    outputs = tuple(outputs)
    override_names = tuple(sorted(override_names))
    cache = getattr(model, "_program_cache", None)
    if cache is None:
        cache = model._program_cache = {}
    # adaptive-distance weights live in a holder dict SHARED across model
    # copies, so mutating them through ONE copy's node changes the traced
    # op for ALL copies — but only bumps that copy's revision.  Keying on
    # the holder's own version keeps every copy's programs fresh (without
    # it, SMC's round program replayed a stale baked len(w) and
    # AdaptiveDistanceSMC crashed at rounds >= 3)
    key = (model.revision, outputs, override_names,
           _adaptive_versions(model))
    if key in cache:
        cache[key] = cache.pop(key)      # LRU: hot entries move to the end
    else:
        cache[key] = CompiledProgram(model, outputs, override_names)
        # the cache is SHARED between a model and its copies (revisions
        # are globally unique), so never evict by revision — other live
        # models may still use those entries; bound the total size,
        # evicting oldest-touched first and never the entry just made
        # (re-tracing a hot program costs a 0.5-15 s remote compile)
        while len(cache) > 64:
            cache.pop(next(k for k in cache if k != key))
    return cache[key]


class CompiledProgram:
    def __init__(self, model, outputs, override_names=()):
        self.model = model
        self.outputs = tuple(outputs)
        self.override_names = frozenset(override_names)
        for o in self.outputs:
            if o not in model.dag:
                raise ValueError(f"Unknown output node {o!r}")
        # a typo'd override name would otherwise pass the runtime guards
        # (it IS declared) yet never be consumed by the trace — the exact
        # silently-ignored-override failure mode the guards exist for
        for o in override_names:
            if o not in model.dag:
                raise ValueError(f"Unknown override node {o!r}")
        #: canonical identity for derived caches (worker program caches,
        #: sharded executables): includes the adaptive-holder versions at
        #: trace time, which model.revision alone does not capture
        self.cache_key = (model.revision, self.outputs,
                          tuple(sorted(override_names)),
                          _adaptive_versions(model))
        # ancestors of outputs, NOT descending past overridden nodes (the
        # reference achieves this with ReduceCompiler + loader injection)
        needed, stack = set(), list(self.outputs)
        while stack:
            n = stack.pop()
            if n in needed:
                continue
            needed.add(n)
            if n not in self.override_names:
                stack.extend(model.dag.parents(n))
        self.order = [n for n in model.dag.topological_order(self.outputs)
                      if n in needed]
        self.host = any(model.dag.get_state(n).get("host", False)
                        for n in self.order)
        self._observed = {}
        self._jitted = {}

    # programs ship to process-pool workers; drop device-side caches
    def __getstate__(self):
        d = self.__dict__.copy()
        d["_observed"] = {}
        d["_jitted"] = {}
        d.pop("_traceables", None)   # closures are process-local
        # compiled fused-loop chunk closures attached by samplers are
        # process-local (jitted locals, unpicklable) — drop them too
        d.pop("_fused_chunks", None)
        return d

    def __setstate__(self, d):
        self.__dict__.update(d)

    # -- observed subgraph (compile-time constants) --------------------------
    def observed_value(self, name):
        """Observed value of an observable node, batch axis of length 1."""
        if name in self._observed:
            return self._observed[name]
        dag = self.model.dag
        st = dag.get_state(name)
        if name in self.model.observed:
            val = jnp.asarray(self.model.observed[name])[None]
        elif st["kind"] == "constant":
            val = st["value"]
        elif st["kind"] in ("summary", "operation") and not st.get("stochastic"):
            parents = [self.observed_value(p) for p in dag.parents(name)]
            val = st["op"](*parents)
        else:
            raise ValueError(
                f"Cannot compute observed value for node {name!r}: no "
                f"observed data was given for its simulator ancestors.")
        self._observed[name] = val
        return val

    # -- tracing -------------------------------------------------------------
    def traceable(self, batch_size):
        """Pure function ``(master_key, batch_index, overrides_dict) ->
        {output: array}`` suitable for embedding in jit / scan / shard_map.

        Cached per batch_size: callers embed the returned closure in jitted
        programs whose caches key on the closure's IDENTITY, so returning a
        fresh object each call would force a retrace (and, with baked
        constants, a recompile) per inference instance."""
        cached = self.__dict__.setdefault("_traceables", {}).get(batch_size)
        if cached is not None:
            return cached
        dag = self.model.dag
        order = self.order
        states = {n: dag.get_state(n) for n in order}
        parent_lists = {n: dag.parents(n) for n in order}
        observed_args = {
            n: tuple(self.observed_value(p) for p in parent_lists[n])
            for n in order if states[n].get("uses_observed")}
        model_name = self.model.name
        override_names = self.override_names

        def fn(master_key, batch_index, overrides):
            unknown = set(overrides) - set(override_names)
            if unknown:
                raise ValueError(
                    f"Overrides {sorted(unknown)} were not declared at "
                    f"compile time (declared: {sorted(override_names)}); "
                    "undeclared overrides would be silently ignored -- "
                    "compile with override_names including them")
            key = jax.random.fold_in(master_key, batch_index)
            meta = {"batch_index": batch_index, "batch_size": batch_size,
                    "model_name": model_name, "submission_index": batch_index}
            vals = {}
            for name in order:
                if name in override_names:
                    v = jnp.asarray(overrides[name])
                    # scalar overrides broadcast over the batch (e.g.
                    # fixed-theta simulation sweeps)
                    vals[name] = jnp.broadcast_to(v, (batch_size,)) \
                        if v.ndim == 0 else v
                    continue
                st = states[name]
                parents = [vals[p] for p in parent_lists[name]]
                kind = st["kind"]
                if kind == "constant":
                    vals[name] = st["value"]
                elif kind == "rv":
                    nkey = jax.random.fold_in(key, node_uid(name))
                    size = st.get("size")
                    if size:
                        total = batch_size * int(np.prod(size))
                        draw = st["distribution"].rvs(*parents, size=total, key=nkey)
                        vals[name] = jnp.reshape(draw, (batch_size,) + tuple(size))
                    else:
                        vals[name] = st["distribution"].rvs(
                            *parents, size=batch_size, key=nkey)
                elif kind == "simulator":
                    nkey = jax.random.fold_in(key, node_uid(name))
                    vals[name] = st["op"](*parents, batch_size=batch_size,
                                          key=nkey)
                elif kind == "discrepancy":
                    vals[name] = st["op"](*parents,
                                          observed=observed_args[name])
                else:  # summary / operation
                    kwargs = {}
                    if st.get("stochastic"):
                        kwargs["key"] = jax.random.fold_in(key, node_uid(name))
                    if st.get("uses_batch_size"):
                        kwargs["batch_size"] = batch_size
                    if st.get("uses_meta"):
                        kwargs["meta"] = meta
                    vals[name] = st["op"](*parents, **kwargs)
            return {o: vals[o] for o in self.outputs}

        self._traceables[batch_size] = fn
        return fn

    def jitted(self, batch_size):
        if batch_size not in self._jitted:
            self._jitted[batch_size] = jax.jit(self.traceable(batch_size))
        return self._jitted[batch_size]

    # -- host execution (external / numpy simulators) -------------------------
    def run_host(self, master_key, batch_index, overrides, batch_size):
        dag = self.model.dag
        key = jax.random.fold_in(master_key, int(batch_index))
        meta = {"batch_index": int(batch_index), "batch_size": batch_size,
                "model_name": self.model.name,
                "submission_index": int(batch_index)}
        vals = {}
        for name in self.order:
            if name in self.override_names:
                v = np.asarray(overrides[name])
                # scalar overrides broadcast over the batch, matching the
                # traced path — host ops that index/reshape per batch
                # member must see the same (batch_size,) shape
                vals[name] = np.broadcast_to(v, (batch_size,)) \
                    if v.ndim == 0 else v
                continue
            st = dag.get_state(name)
            parents = [vals[p] for p in dag.parents(name)]
            kind = st["kind"]
            nkey = jax.random.fold_in(key, node_uid(name))
            if kind == "constant":
                vals[name] = st["value"]
            elif kind == "rv":
                dist = st["distribution"]
                if getattr(dist, "host", False):
                    # scipy-adapter RVs draw with a RandomState derived
                    # from the same per-node counter key (replayable)
                    rkw = {"random_state":
                           np.random.RandomState(_host_seed(nkey))}
                else:
                    rkw = {"key": nkey}
                size = st.get("size")
                if size:
                    total = batch_size * int(np.prod(size))
                    draw = dist.rvs(*parents, size=total, **rkw)
                    vals[name] = np.reshape(np.asarray(draw),
                                            (batch_size,) + tuple(size))
                else:
                    vals[name] = dist.rvs(*parents, size=batch_size, **rkw)
            elif kind in ("simulator", "summary", "operation", "discrepancy"):
                kwargs = {}
                if kind == "simulator" or st.get("stochastic"):
                    if st.get("host"):
                        kwargs["random_state"] = np.random.RandomState(
                            _host_seed(nkey))
                    else:
                        kwargs["key"] = nkey
                if kind == "simulator" or st.get("uses_batch_size"):
                    kwargs["batch_size"] = batch_size
                if st.get("uses_meta"):
                    kwargs["meta"] = meta
                if kind == "discrepancy":
                    kwargs["observed"] = tuple(self.observed_value(p)
                                               for p in dag.parents(name))
                try:
                    vals[name] = st["op"](*parents, **kwargs)
                except Exception as e:
                    raise RuntimeError(
                        f"Executing node {name!r} failed: {e}") from e
            else:
                raise ValueError(f"Unknown node kind {kind!r} at {name!r}")
        return {o: vals[o] for o in self.outputs}

    # -- entry point -----------------------------------------------------------
    def run(self, master_key, batch_index, overrides=None, batch_size=1):
        overrides = dict(overrides or {})
        unknown = set(overrides) - set(self.override_names)
        if unknown:
            raise ValueError(
                f"Overrides {sorted(unknown)} were not declared at compile "
                f"time (declared: {sorted(self.override_names)}); compile "
                "with override_names including them")
        if self.host:
            return self.run_host(master_key, batch_index, overrides,
                                 batch_size)
        overrides = {k: jnp.asarray(v) for k, v in overrides.items()}
        return self.jitted(batch_size)(
            master_key, jnp.asarray(batch_index, jnp.uint32), overrides)


def _host_seed(key):
    """Single key->seed convention shared with the scipy host-path
    adapter — see :func:`elfi_tpu.ops.distributions.host_seed`."""
    from ..ops.distributions import host_seed
    return host_seed(key)
