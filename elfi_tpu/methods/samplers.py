"""Sampling-based ABC inference: Rejection, SMC, AdaptiveDistanceSMC,
AdaptiveThresholdSMC (reference ``elfi/methods/inference/samplers.py``).

TPU-native design points vs the reference:

- The running top-N sample buffer lives ON DEVICE and is maintained with a
  jitted ``lax.top_k`` merge (:mod:`elfi_tpu.ops.topk`) instead of host-side
  ``np.argsort`` per batch (reference ``samplers.py:209-237``).
- When nothing host-side is needed (no pool, no adaptive distance),
  ``Rejection.sample`` runs a FUSED path: the whole
  simulate->distance->merge loop is a single jitted ``lax.scan`` over batch
  indices, so a million-simulation inference is one XLA dispatch per chunk.
  Both paths use identical per-batch keys and merge ops, so they produce
  identical samples for a given seed.
"""

from __future__ import annotations

import logging
from math import ceil

import numpy as np

import jax
import jax.numpy as jnp

from ..compile.compiler import compile_program
from ..model.extensions import ModelPrior
from ..model.model import AdaptiveDistance
from ..ops import topk
from ..parallel.backends import NativeBackend, ShardedBackend
from ..utils import get_sub_seed
from .base import Sampler, _ProgressBar
from .results import Sample, SmcSample
from .utils import (GMDistribution, arr2d_to_batch, weighted_sample_quantile,
                    weighted_var)

__all__ = ["Rejection", "SMC", "AdaptiveDistanceSMC", "AdaptiveThresholdSMC"]

logger = logging.getLogger(__name__)

_FUSED_CHUNK = 64  # scan length per fused dispatch (compile-time constant)

#: Merge unroll: number of program invocations whose outputs are
#: CONCATENATED into one top-N merge per fused-scan step.  ``None`` = auto
#: (:func:`_fused_unroll`); an int forces the factor (benchmarks A/B it).
#: Bit-identity with the per-batch schedule: ``lax.top_k`` breaks ties by
#: lower concatenation index, and the concat order buffer -> batch_j ->
#: batch_{j+1} is exactly the order those rows occupy across sequential
#: merges, so the selected rows and their output order are unchanged.
#: Motivation (scripts/xla_rej_profile.py, TPU 2026-08-20): at batch 2^17
#: the compiled MA2 program costs 0.226 ms/iter but program+merge costs
#: 0.448 ms/iter — the merge is ~half the loop — while a flat 529k->5000
#: ``top_k`` costs the same ~0.23 ms as a 136k->5000 one, so merging every
#: u batches amortizes a near-fixed cost u-fold.
FUSED_UNROLL = None
_UNROLL_CAND_CAP = 1 << 21   # max concatenated candidate rows per merge
_UNROLL_MAX = 16
_UNROLL_MAX_BATCH = 1 << 18  # above this the cull already hides the merge
_UNROLL_BYTES_CAP = 256      # skip unroll for wide per-sim outputs (HBM)


def _fused_unroll(batch_size, shapes):
    """Resolve the merge-unroll factor for a fused rejection run.

    Measured end-to-end (scripts/unroll_ab.py, TPU v5e 2026-08-20,
    MA2 n=5000, 2^28 sims): XLA path at batch 2^17 goes 248 -> 318
    M sims/s at u=16 (+28%); 2^18 goes 189 -> 212 at u=4-8.  At batch
    >= 2^20 (the Pallas operating point) unrolling HURTS: 367 -> 365
    (u=2) -> 330 (u=4) M sims/s — the threshold-culled merge already
    amortizes there and the concatenated candidate buffer starts paying
    HBM traffic — hence the ``_UNROLL_MAX_BATCH`` guard.
    """
    if FUSED_UNROLL is not None:
        return max(1, int(FUSED_UNROLL))
    if batch_size > _UNROLL_MAX_BATCH:
        return 1
    bytes_per_sim = sum(
        int(np.prod(v.shape[1:], dtype=np.int64)) * v.dtype.itemsize
        for v in shapes.values())
    if bytes_per_sim > _UNROLL_BYTES_CAP:
        return 1
    return int(max(1, min(_UNROLL_MAX, _UNROLL_CAND_CAP // batch_size)))


class Rejection(Sampler):
    """Parallel ABC rejection sampler (reference ``samplers.py:57-317``)."""

    def __init__(self, model, discrepancy_name=None, output_names=None,
                 **kwargs):
        model, discrepancy_name = self._resolve_model(model, discrepancy_name)
        output_names = [discrepancy_name] + model.parameter_names \
            + (output_names or [])
        self.adaptive = isinstance(model[discrepancy_name], AdaptiveDistance)
        if self.adaptive:
            model[discrepancy_name].init_adaptation_round()
            self.sums = [s.name for s in model[discrepancy_name].parents]
            for k in self.sums:
                if k not in output_names:
                    output_names.append(k)
        super().__init__(model, output_names, **kwargs)
        self.discrepancy_name = discrepancy_name
        self._merge = topk.make_merge_fn(discrepancy_name)

    # -- objective ---------------------------------------------------------
    def set_objective(self, n_samples, threshold=None, quantile=None,
                      n_sim=None):
        if quantile is None and threshold is None and n_sim is None:
            quantile = .01
        self.state = dict(samples=None, threshold=np.inf, n_sim=0,
                          accept_rate=1, n_batches=0, n_accepted=0)
        if quantile:
            n_sim = ceil(n_samples / quantile)
        if n_sim:
            n_batches = ceil(n_sim / self.batch_size)
        else:
            n_batches = self.max_parallel_batches
        self.objective = dict(n_samples=n_samples, threshold=threshold,
                              n_batches=n_batches)
        self.batches.reset()

    # -- batch-at-a-time path ------------------------------------------------
    def update(self, batch, batch_index):
        super().update(batch, batch_index)
        if self.state["samples"] is None:
            self.state["samples"] = topk.init_buffers(
                self.objective["n_samples"], batch, self.discrepancy_name)
        if self.adaptive:
            self.model[self.discrepancy_name].add_data(
                *(np.asarray(batch[s]) for s in self.sums))
        thr = self._merge_threshold()
        self.state["samples"], acc = self._merge(self.state["samples"],
                                                 dict(batch), thr)
        if self.objective.get("threshold") is not None:
            self.state["n_accepted"] += int(acc)
            self._update_objective_n_batches()
        else:
            self.state["n_accepted"] += self.batch_size

    def _merge_threshold(self):
        t = self.objective.get("threshold")
        if t is None:
            return jnp.float32(jnp.inf)
        return jnp.asarray(t, jnp.float32)

    def _update_objective_n_batches(self):
        """Dynamic re-estimation of needed batches under a fixed threshold
        (reference ``samplers.py:246-277``)."""
        s = self.state
        n_samples = self.objective["n_samples"]
        n_acceptable = s["n_accepted"]
        if n_acceptable == 0:
            n_batches = self.objective["n_batches"] + 1
        else:
            accept_rate_t = n_acceptable / s["n_sim"]
            margin = .2 * self.batch_size * int(n_acceptable < n_samples)
            n_batches = ceil((n_samples / accept_rate_t + margin)
                             / self.batch_size)
        self.objective["n_batches"] = max(n_batches, s["n_batches"])

    # -- result ------------------------------------------------------------------
    def extract_result(self):
        if self.state["samples"] is None:
            raise ValueError("Nothing to extract")
        if self.adaptive:
            self._update_distances()
        # one device_get for the whole pytree: a per-array fetch costs a
        # full round trip each on a remote-attached chip
        fetched = jax.device_get(self.state["samples"])
        outputs = {k: np.asarray(v)
                   for k, v in fetched.items() if k != "__key"}
        self._update_state_meta(outputs)
        return Sample(outputs=outputs, **self._extract_result_kwargs())

    def _update_state_meta(self, outputs):
        n = self.objective["n_samples"]
        d = np.asarray(outputs[self.discrepancy_name])
        self.state["threshold"] = d[n - 1]
        self.state["accept_rate"] = min(1, n / max(self.state["n_sim"], 1))

    def _update_distances(self):
        """Adaptive distance: freeze the new scale, recompute and re-sort the
        kept sample under it (reference ``samplers.py:279-299``)."""
        node = self.model[self.discrepancy_name]
        node.update_distance()
        nums = self.objective["n_samples"]
        samples = {k: np.asarray(v) for k, v in self.state["samples"].items()}
        data = {s: samples[s][:nums] for s in self.sums}
        prog = compile_program(self.model, (self.discrepancy_name,),
                               override_names=tuple(sorted(data)))
        ds = np.asarray(prog.run(jax.random.key(self.seed), 0, data,
                                 batch_size=nums)[self.discrepancy_name])
        sort_distance = ds if ds.ndim == 1 else ds[:, -1]
        order = np.argsort(sort_distance)
        new = {}
        for k, v in samples.items():
            if k == self.discrepancy_name:
                new[k] = sort_distance[order]
            elif k == "__key":
                new[k] = sort_distance[order]
            else:
                new[k] = v[order]
        self.state["samples"] = new

    # -- fused path -----------------------------------------------------------------
    def sample(self, n_samples, threshold=None, quantile=None, n_sim=None,
               fused=None, bar=True, **kwargs):
        """Sample from the approximate posterior.

        ``fused=True`` (default when eligible) runs the entire rejection
        loop as jitted ``lax.scan`` chunks on device.
        """
        self.bar = bar
        eligible = (self.pool is None and not self.adaptive
                    and isinstance(self.client, (NativeBackend,
                                                 ShardedBackend))
                    and not kwargs)
        if fused is None:
            fused = eligible
        if fused and not eligible:
            raise ValueError("fused=True requires: no pool, no adaptive "
                             "distance, native backend")
        self.set_objective(n_samples, threshold=threshold, quantile=quantile,
                           n_sim=n_sim)
        prog = compile_program(self.model, tuple(self.output_names))
        if fused and prog.host:
            fused = False
        if not fused:
            return self.infer(n_samples, threshold=threshold,
                              quantile=quantile, n_sim=n_sim, bar=bar,
                              **kwargs)
        self._run_fused(prog, threshold)
        self.batches.reset()
        return self.extract_result()

    def _run_fused(self, prog, threshold, seed=None, start_index=0,
                   overrides_spec=None):
        """Run the fused rejection loop.

        ``overrides_spec`` (used by fused SMC rounds) is a triple
        ``(tag, fn, args)``: ``fn(args, batch_index) -> overrides dict`` is
        a traceable per-batch override builder whose behaviour is fully
        determined by ``tag`` + ``args`` (``tag`` keys the compiled-chunk
        cache; round-varying data must flow through ``args``).
        """
        if seed is None:
            seed = self.seed
        ov_tag = ov_fn = None
        ov_args = ()
        if overrides_spec is not None:
            ov_tag, ov_fn, ov_args = overrides_spec
        fn = prog.traceable(self.batch_size)
        disc = self.discrepancy_name
        # multi-chip: shard the batch axis of every per-simulation array
        # over the mesh inside the scan; the top-k merge's gather lowers to
        # ICI collectives and the carried buffers stay replicated
        shard = None
        if isinstance(self.client, ShardedBackend):
            from jax.sharding import NamedSharding, PartitionSpec as P
            if self.batch_size % self.client.n_devices:
                raise ValueError(
                    f"batch_size {self.batch_size} not divisible by mesh "
                    f"size {self.client.n_devices}")
            batched = NamedSharding(self.client.mesh,
                                    P(self.client.axis_name))

            def shard_outputs(out):
                return {k: jax.lax.with_sharding_constraint(v, batched)
                        if (jnp.ndim(v) >= 1
                            and v.shape[0] == self.batch_size) else v
                        for k, v in out.items()}

            shard = shard_outputs
        n = self.objective["n_samples"]
        thr_given = threshold is not None
        thr0 = np.asarray(threshold, np.float32) if thr_given \
            else np.float32(np.inf)

        shapes = jax.eval_shape(
            fn, jax.eval_shape(jax.random.key, 0), jnp.uint32(0),
            jax.eval_shape(lambda a: ov_fn(a, jnp.uint32(0)), ov_args)
            if ov_fn else {})

        def init_buffers():
            buffers = {k: (jnp.full((n,) + v.shape[1:], jnp.inf, jnp.float32)
                           if k == disc else
                           jnp.zeros((n,) + v.shape[1:], v.dtype))
                       for k, v in shapes.items()}
            buffers["__key"] = jnp.full((n,), jnp.inf, jnp.float32)
            return buffers

        # cache compiled chunks ON the program so repeated sample() calls
        # and fresh Rejection instances reuse the executable (the scan body
        # is a closure; a per-call jit would recompile every time)
        chunk_cache = prog.__dict__.setdefault("_fused_chunks", {})
        shard_tag = None if shard is None else (self.client.n_devices,
                                                self.client.axis_name)

        unroll = _fused_unroll(self.batch_size, shapes)

        def one_batch(master_key, i, ov):
            out = fn(master_key, i, ov_fn(ov, i) if ov_fn else {})
            if shard is not None:
                out = shard(out)
            return out

        def scan_batches(master_key, bufs, thr, start, length, ov):
            def step(b, i):
                return topk.merge_scan(b, one_batch(master_key, i, ov),
                                       thr, disc)

            def step_u(b, i0):
                outs = [one_batch(master_key, i0 + jnp.uint32(j), ov)
                        for j in range(unroll)]
                cat = {k: jnp.concatenate([o[k] for o in outs])
                       for k in outs[0]}
                return topk.merge_scan(b, cat, thr, disc)

            n_full, rem = divmod(length, unroll) if unroll > 1 \
                else (length, 0)
            acc = jnp.int32(0)
            if n_full and unroll > 1:
                idx = start + jnp.arange(n_full, dtype=jnp.uint32) \
                    * jnp.uint32(unroll)
                bufs, accs = jax.lax.scan(step_u, bufs, idx)
                acc = acc + jnp.sum(accs)
            elif n_full:
                idx = start + jnp.arange(n_full, dtype=jnp.uint32)
                bufs, accs = jax.lax.scan(step, bufs, idx)
                acc = acc + jnp.sum(accs)
            if rem:
                idx = start + jnp.uint32(n_full * unroll) \
                    + jnp.arange(rem, dtype=jnp.uint32)
                bufs, accs = jax.lax.scan(step, bufs, idx)
                acc = acc + jnp.sum(accs)
            return bufs, acc

        def chunk_fn(length):
            cache_key = (self.batch_size, n, length, shard_tag,
                         tuple(sorted(self.output_names)), ov_tag, unroll,
                         topk.MERGE_VARIANT, topk.CULL_SMALL_K,
                         topk.CULL_MIN_BATCH)
            if cache_key not in chunk_cache:
                def body(master_key, bufs, thr, ov):
                    start = bufs.pop("__start")
                    bufs, acc = scan_batches(master_key, bufs, thr, start,
                                             length, ov)
                    bufs["__start"] = start + jnp.uint32(length)
                    return bufs, acc
                chunk_cache[cache_key] = jax.jit(body)
            return chunk_cache[cache_key]

        def whole_fn(length):
            # no-threshold, no-progress-bar runs: buffer init + ALL batches
            # in ONE dispatch -- on a remote-attached chip every extra
            # dispatch / device_put is a ~10-50 ms round trip
            cache_key = (self.batch_size, n, "whole", length, shard_tag,
                         tuple(sorted(self.output_names)), ov_tag, unroll,
                         topk.MERGE_VARIANT, topk.CULL_SMALL_K,
                         topk.CULL_MIN_BATCH)
            if cache_key not in chunk_cache:
                def body(seed_, thr, start, ov):
                    master_key = jax.random.key(seed_)
                    bufs, acc = scan_batches(master_key, init_buffers(), thr,
                                             start, length, ov)
                    return bufs, acc
                chunk_cache[cache_key] = jax.jit(body)
            return chunk_cache[cache_key]

        pb = _ProgressBar() if self.bar else None
        if not thr_given:
            n_batches = self.objective["n_batches"]
            if pb is None:
                buffers, _ = whole_fn(n_batches)(
                    jnp.uint32(seed), jnp.float32(thr0),
                    jnp.uint32(start_index), ov_args)
                done = n_batches
            else:
                master = jax.device_put(jax.random.key(seed))
                thr_dev = jax.device_put(jnp.asarray(thr0))
                buffers = init_buffers()
                buffers["__start"] = jnp.uint32(start_index)
                done = 0
                while done < n_batches:
                    length = min(_FUSED_CHUNK, n_batches - done)
                    buffers, acc = chunk_fn(length)(master, buffers, thr_dev,
                                                    ov_args)
                    done += length
                    pb.update(done, n_batches)
            self.state["n_accepted"] = done * self.batch_size
        else:
            master = jax.device_put(jax.random.key(seed))
            thr_dev = jax.device_put(jnp.asarray(thr0))
            buffers = init_buffers()
            buffers["__start"] = jnp.uint32(start_index)
            done, accepted = 0, 0
            max_batches = 100_000
            # each dispatch costs a tunnel round trip while on-device
            # simulations are nearly free, so chunks stay large: a modest
            # first probe, then full chunks
            length = min(_FUSED_CHUNK, max(16, self.objective["n_batches"]))
            while accepted < n and done < max_batches:
                buffers, acc = chunk_fn(length)(master, buffers, thr_dev,
                                                ov_args)
                done += length
                accepted += int(acc)
                if pb:
                    pb.update(min(accepted, n), n)
                length = _FUSED_CHUNK
            self.state["n_accepted"] = accepted
            if accepted < n:
                logger.warning(
                    "Threshold %s unattainable within %d batches: only %d of "
                    "%d requested samples were accepted; the remaining rows "
                    "of the returned sample are +inf-discrepancy padding.",
                    thr0, max_batches, accepted, n)
        buffers.pop("__start", None)
        if pb:
            pb.finish()
        self.state["n_batches"] = done
        self.state["n_sim"] = done * self.batch_size
        self.state["samples"] = buffers
        self.objective["n_batches"] = done

    def plot_state(self, **options):
        from ..visualization import plot_sample
        samples = {k: np.asarray(v) for k, v in self.state["samples"].items()}
        plot_sample(samples, nodes=self.parameter_names,
                    n=self.objective["n_samples"], **options)


class _RoundSchedule:
    """Acceptance schedule for a run of SMC rounds.

    Global round ``r`` is driven either by an explicit distance threshold
    or by a selection quantile that gets RESOLVED into a threshold against
    round ``r-1``'s population when the round begins.  Continuation
    (calling ``sample`` again) appends rounds after the existing ones, so
    global round numbering survives across calls.  AdaptiveThresholdSMC
    fills its quantile slots between rounds from the density-ratio fit.
    """

    def __init__(self):
        self.thresholds = []
        self.quantiles = []

    @property
    def n_rounds(self):
        return len(self.thresholds)

    def extend(self, n, thresholds=None, quantiles=None):
        for i in range(n):
            self.thresholds.append(
                None if thresholds is None else thresholds[i])
            self.quantiles.append(
                None if quantiles is None else quantiles[i])


def _gm_overrides_fn(parameter_names, batch_size, prior_logpdf):
    """Traceable per-batch proposal builder for fused SMC rounds.

    Mirrors :meth:`SMC.prepare_new_batch` exactly (same key folding, same
    GM draw + prior-support redraws), so fused and unfused rounds propose
    bit-identical parameters.  Round-varying data (means, cov, weights,
    round seed) flows through ``args`` so one compiled chunk serves all
    rounds.
    """
    pnames = tuple(parameter_names)

    def fn(args, batch_index):
        means, cov, weights, round_seed = args
        rkey = jax.random.fold_in(jax.random.key(round_seed), 0x9E3779B9)
        key = jax.random.fold_in(rkey, batch_index)
        params = GMDistribution.rvs_traced(means, cov, weights, batch_size,
                                           prior_logpdf, key)
        return {p: params[:, j] for j, p in enumerate(pnames)}

    return fn


class SMC(Sampler):
    """Sequential Monte Carlo ABC (reference ``samplers.py:320-559``)."""

    def __init__(self, model, discrepancy_name=None, output_names=None,
                 **kwargs):
        model, discrepancy_name = self._resolve_model(model, discrepancy_name)
        output_names = [discrepancy_name] + model.parameter_names \
            + (output_names or [])
        super().__init__(model, output_names, **kwargs)
        self._prior = ModelPrior(self.model)
        self.discrepancy_name = discrepancy_name
        self.state["round"] = 0
        self._populations = []
        self._rejection = None
        self._round_key = None
        self.schedule = _RoundSchedule()

    def sample(self, n_samples, thresholds=None, quantiles=None, fused=None,
               bar=True, **kwargs):
        """Sample from the SMC posterior.

        ``fused=True`` (default when eligible) runs each round's
        simulate -> distance -> top-k loop as jitted ``lax.scan`` chunks on
        device, with the Gaussian-mixture proposal draws (including the
        prior-support redraws) inside the scan.  Proposals and merges are
        bit-identical to the unfused path; only the stopping point of
        threshold rounds differs (the fused loop stops at chunk granularity
        once ``n_samples`` are accepted, the unfused loop at its dynamic
        batch estimate).
        """
        self.bar = bar
        fused, prog = self._resolve_fused(fused, kwargs)
        if not fused:
            return super().sample(n_samples, thresholds=thresholds,
                                  quantiles=quantiles, bar=bar, **kwargs)
        return self._sample_fused(
            n_samples, dict(thresholds=thresholds, quantiles=quantiles),
            prog)

    # adaptive DISTANCES need per-batch host updates (never fused);
    # adaptive thresholds only do host work BETWEEN rounds (fusable)
    _fused_capable = True

    def _resolve_fused(self, fused, kwargs):
        eligible = (self._fused_capable and self.pool is None
                    and isinstance(self.client, (NativeBackend,
                                                 ShardedBackend))
                    and not kwargs)
        prog = None
        if eligible:
            prog = compile_program(self.model, tuple(self.output_names))
            eligible = not prog.host
        if fused is None:
            fused = eligible
        if fused and not eligible:
            raise ValueError("fused=True requires: no adaptive distance, "
                             "no pool, native/sharded backend, "
                             "device-traceable model")
        return fused, prog

    def _fused_advance_round(self):
        """Round transition for the fused driver; returns False when the
        run is complete (mirrors the unfused ``update`` logic)."""
        if self.state["round"] < self.objective["round"]:
            self._advance_round()
            return True
        return False

    def _sample_fused(self, n_samples, objective_kwargs, prog):
        self.set_objective(n_samples, **objective_kwargs)
        prior_logpdf = self._prior.traceable_logpdf()
        # rounds > 0 need the parameter nodes DECLARED as overrides at
        # compile time -- an undeclared override is silently ignored by the
        # traced program (overrides cut the trace at those nodes)
        prog_prop = compile_program(
            self.model, tuple(self.output_names),
            override_names=tuple(sorted(self.parameter_names)))
        start = self.state.get("_next_batch_index", 0)
        pb = _ProgressBar() if self.bar else None
        while True:
            rej = self._rejection
            rej.bar = False
            ov_spec = None
            rnd = self.state["round"]
            if rnd > 0:
                means, cov, weights = self._gm_params
                round_seed = get_sub_seed(self.seed, rnd)
                ov_spec = (
                    ("gm", tuple(self.parameter_names), self.batch_size),
                    _gm_overrides_fn(self.parameter_names, self.batch_size,
                                     prior_logpdf),
                    (jnp.asarray(means, jnp.float32),
                     jnp.asarray(cov, jnp.float32),
                     jnp.asarray(weights, jnp.float32),
                     jnp.uint32(round_seed)))
            rej._run_fused(prog if rnd == 0 else prog_prop,
                           rej.objective.get("threshold"),
                           seed=self.seed, start_index=start,
                           overrides_spec=ov_spec)
            start += rej.state["n_batches"]
            self.state["n_sim"] += rej.state["n_sim"]
            self.state["n_batches"] = self.state.get("n_batches", 0) \
                + rej.state["n_batches"]
            if pb:
                pb.update(rnd + 1, self.objective["round"] + 1)
            if not self._fused_advance_round():
                break
        if pb:
            pb.finish()
        self.state["_next_batch_index"] = start
        return self.extract_result()

    def set_objective(self, n_samples, thresholds=None, quantiles=None):
        if thresholds is None and quantiles is None:
            raise ValueError("Either thresholds or quantiles is required")
        # continuation: new rounds append after the stored populations
        self.state["round"] = len(self._populations)
        given = thresholds if thresholds is not None else quantiles
        self.schedule.extend(len(given), thresholds=thresholds,
                             quantiles=quantiles)
        self.objective.update(dict(n_samples=n_samples,
                                   n_batches=self.max_parallel_batches,
                                   round=self.schedule.n_rounds - 1))
        self._begin_round()
        self._update_objective()

    def extract_result(self):
        pop = self._extract_population()
        self._populations.append(pop)
        return SmcSample(outputs=pop.outputs,
                         populations=self._populations.copy(),
                         weights=pop.weights, threshold=pop.meta["threshold"],
                         **self._extract_result_kwargs())

    def update(self, batch, batch_index):
        super().update(batch, batch_index)
        self._rejection.update(batch, batch_index)
        if self._rejection.finished:
            self.batches.cancel_pending()
            self._advance_round()
        self._update_objective()

    def _advance_round(self):
        if self.state["round"] < self.objective["round"]:
            self._populations.append(self._extract_population())
            self.state["round"] += 1
            self._begin_round()

    def prepare_new_batch(self, batch_index):
        if self.state["round"] == 0:
            return None
        key = jax.random.fold_in(self._round_key, batch_index)
        params = GMDistribution.rvs(*self._gm_params, size=self.batch_size,
                                    prior_logpdf=self._prior.logpdf, key=key)
        return arr2d_to_batch(np.asarray(params), self.parameter_names)

    def _begin_round(self):
        """Enter round ``state['round']``: build its internal Rejection and
        give it the round's acceptance rule (resolving a scheduled quantile
        into a concrete threshold against the previous population)."""
        r = self.state["round"]
        self._spawn_round_rejection(r)
        q = self.schedule.quantiles[r]
        if r == 0 and q is not None:
            # no population to take a quantile of yet
            self._rejection.set_objective(self.objective["n_samples"],
                                          quantile=q)
            return
        if q is not None:
            self.schedule.thresholds[r] = self._quantile_threshold(r, q)
        self._rejection.set_objective(
            self.objective["n_samples"],
            threshold=self.current_population_threshold)

    def _quantile_threshold(self, r, q):
        """Threshold for round ``r`` = weighted q-quantile of round
        ``r-1``'s accepted discrepancies."""
        prev = self._populations[r - 1]
        return weighted_sample_quantile(x=prev.discrepancies, alpha=q,
                                        weights=prev.weights)

    def _spawn_round_rejection(self, r):
        # Batch indices keep increasing GLOBALLY across rounds (fresh
        # simulator noise every round) because this SMC instance owns the
        # BatchHandler; the per-round Rejection only consumes batches, and
        # its sub-seed scopes the round bookkeeping.
        seed = self.seed if r == 0 else get_sub_seed(self.seed, r)
        self._round_key = jax.random.fold_in(jax.random.key(seed), 0x9E3779B9)
        self._rejection = Rejection(
            self.model, discrepancy_name=self.discrepancy_name,
            output_names=self.output_names, batch_size=self.batch_size,
            seed=seed, max_parallel_batches=self.max_parallel_batches)

    def _extract_population(self):
        sample = self._rejection.extract_result()
        sample.method_name = "Rejection within SMC-ABC"
        theta, w, cov = self._weigh_population(sample)
        sample.means = theta
        sample.weights = w
        sample.meta["cov"] = cov
        return sample

    def _weigh_population(self, pop):
        """Importance weights, parameter matrix and perturbation covariance
        for an accepted population.

        Draws came from the Gaussian-mixture proposal q (round 0: the
        prior itself), so ``w = prior(theta) / q(theta)``; the next round
        perturbs with the component-wise kernel ``cov = 2 Var_w(theta)``
        (Beaumont et al. 2009)."""
        from .utils import batch_to_arr2d
        theta = batch_to_arr2d(pop.outputs, self.parameter_names)
        if not self._populations:
            w = np.ones(pop.n_samples)
        else:
            prior_lp = np.asarray(self._prior.logpdf(theta))
            # the fused proposal's redraw while_loop caps at 1000 rounds
            # and cannot raise mid-scan; draws outside the prior support
            # that survived it (near-degenerate proposal mass) would
            # otherwise enter the population as silent zero-weight
            # members — fail loudly like the host rvs path does
            if not np.all(np.isfinite(prior_lp)):
                raise RuntimeError(
                    "Could not draw proposal points inside the prior "
                    "support — accepted population contains "
                    f"{int(np.sum(~np.isfinite(prior_lp)))} out-of-support "
                    "draws (near-degenerate proposal?)")
            log_w = (prior_lp
                     - np.asarray(GMDistribution.logpdf(theta,
                                                        *self._gm_params)))
            w = np.exp(log_w)
        if not np.any(w > 0):
            raise RuntimeError(
                "Every importance weight is zero — with a bounded-support "
                "prior this usually means the population is too small.")
        cov = 2.0 * np.diag(weighted_var(theta, w))
        if not np.all(np.isfinite(cov)):
            cov = np.eye(theta.shape[1])
        return theta.copy(), w, cov

    def _update_objective(self):
        done = sum(pop.meta["n_batches"] for pop in self._populations)
        self.objective["n_batches"] = done + \
            self._rejection.objective["n_batches"]

    @property
    def _gm_params(self):
        sample = self._populations[-1]
        return sample.means, sample.meta["cov"], sample.weights

    @property
    def current_population_threshold(self):
        return self.schedule.thresholds[self.state["round"]]

    def _extract_result_kwargs(self):
        kwargs = super()._extract_result_kwargs()
        kwargs.pop("threshold", None)
        return kwargs


class AdaptiveDistanceSMC(SMC):
    """SMC-ABC with adaptive distance (Prangle 2017 Algorithm 5; reference
    ``samplers.py:562-659``)."""

    def __init__(self, model, discrepancy_name=None, output_names=None,
                 **kwargs):
        model, discrepancy_name = self._resolve_model(model, discrepancy_name)
        if not isinstance(model[discrepancy_name], AdaptiveDistance):
            raise TypeError("This method requires an adaptive distance node")
        model[discrepancy_name].init_state()
        sums = [s.name for s in model[discrepancy_name].parents]
        if output_names is None:
            output_names = sums
        else:
            output_names = output_names + [k for k in sums
                                           if k not in output_names]
        super().__init__(model, discrepancy_name, output_names=output_names,
                         **kwargs)

    _fused_capable = False  # per-batch Welford scale updates are host-side

    def sample(self, n_samples, rounds, quantile=0.5, bar=True, **kwargs):
        return Sampler.sample(self, n_samples, rounds=rounds,
                              quantile=quantile, bar=bar, **kwargs)

    def set_objective(self, n_samples, rounds, quantile=0.5):
        super().set_objective(ceil(n_samples / quantile),
                              quantiles=[1] * rounds)
        self.population_size = n_samples
        self.quantile = quantile

    def _extract_population(self):
        rejection_sample = self._rejection.extract_result()
        outputs = {k: rejection_sample.outputs[k][:self.population_size]
                   for k in self.output_names}
        meta = dict(rejection_sample.meta)
        node = self.model[self.discrepancy_name]
        meta["adaptive_distance_w"] = node.adaptive_state["w"][-1]
        d = outputs[self.discrepancy_name]
        meta["threshold"] = float(np.max(d if d.ndim == 1 else d[:, -1]))
        meta["accept_rate"] = self.population_size / meta["n_sim"]
        sample = Sample("Rejection within adaptive distance SMC-ABC",
                        outputs, self.parameter_names,
                        discrepancy_name=self.discrepancy_name, **meta)
        theta, w, cov = self._weigh_population(sample)
        sample.means = theta
        sample.weights = w
        sample.meta["cov"] = cov
        return sample

    def _extract_result_kwargs(self):
        kwargs = super()._extract_result_kwargs()
        kwargs["adaptive_distance_w"] = [pop.meta["adaptive_distance_w"]
                                         for pop in self._populations]
        return kwargs

    def _quantile_threshold(self, r, q):
        # the distance functions change every round, so the next round's
        # bound is the previous population's max distance, not a quantile
        return self._populations[r - 1].meta["threshold"]

    @property
    def current_population_threshold(self):
        """Vector threshold: one bound per accumulated distance function."""
        return np.asarray(
            [np.inf] + [pop.meta["threshold"] for pop in self._populations],
            dtype=np.float32)


class AdaptiveThresholdSMC(SMC):
    """ABC-SMC with adaptive threshold selection via density-ratio
    estimation (Simola et al. 2021; reference ``samplers.py:662-841``)."""

    def __init__(self, model, discrepancy_name=None, output_names=None,
                 initial_quantile=0.20, q_threshold=0.99,
                 densratio_estimation=None, **kwargs):
        super().__init__(model, discrepancy_name,
                         output_names=output_names, **kwargs)
        self.q_threshold = q_threshold
        self.initial_quantile = initial_quantile
        from .density_ratio_estimation import DensityRatioEstimation
        self.densratio = densratio_estimation or DensityRatioEstimation(
            n=100, epsilon=0.001, max_iter=200, abs_tol=0.01, fold=5,
            optimize=False)

    def sample(self, n_samples, max_iter=10, fused=None, bar=True, **kwargs):
        """Sample with adaptive threshold selection.  Rounds run fused on
        device by default (eligibility as for :meth:`SMC.sample`); the
        density-ratio quantile selection happens between rounds on host."""
        self.bar = bar
        fused, prog = self._resolve_fused(fused, kwargs)
        if not fused:
            return Sampler.sample(self, n_samples, max_iter=max_iter,
                                  bar=bar, **kwargs)
        return self._sample_fused(n_samples, dict(max_iter=max_iter), prog)

    def _fused_advance_round(self):
        """Mirrors the unfused ``update``: fit the density ratio, stop when
        the next quantile exceeds ``q_threshold`` or rounds run out."""
        self._new_population = self._extract_population()
        if self.state["round"] >= self.objective["round"]:
            return False
        if self._set_adaptive_quantile() >= self.q_threshold:
            return False
        self._populations.append(self._new_population)
        self.state["round"] += 1
        self._begin_round()
        return True

    def set_objective(self, n_samples, max_iter=10):
        self.state["round"] = len(self._populations)
        # quantile slots beyond round 0 stay empty until the density-ratio
        # fit fills them between rounds
        self.schedule.extend(max_iter,
                             quantiles=[self.initial_quantile]
                             + [None] * (max_iter - 1))
        self.objective.update(dict(n_samples=n_samples,
                                   n_batches=self.max_parallel_batches,
                                   round=self.schedule.n_rounds - 1))
        self._begin_round()
        self._update_objective()

    def update(self, batch, batch_index):
        Sampler.update(self, batch, batch_index)
        self._rejection.update(batch, batch_index)
        if self._rejection.finished:
            self.batches.cancel_pending()
            self._new_population = self._extract_population()
            if self.state["round"] < self.objective["round"] and \
                    self._set_adaptive_quantile() < self.q_threshold:
                self._populations.append(self._new_population)
                self.state["round"] += 1
                self._begin_round()
        self._update_objective()

    def _set_adaptive_quantile(self):
        """Fill the NEXT round's quantile slot with
        ``max(1 / max-density-ratio, 0.05)`` and return it (reference
        ``samplers.py:791-813``)."""
        from .density_ratio_estimation import calculate_densratio_basis_sigma
        cur = self._resolve_sample(0)
        prev = self._resolve_sample(-1)
        if self.densratio.optimize:
            sigma = list(10.0 ** np.arange(-1, 6))
        else:
            sigma = calculate_densratio_basis_sigma(cur["sigma_max"],
                                                    prev["sigma_max"])
        self.densratio.fit(x=cur["samples"], y=prev["samples"],
                           weights_x=cur["weights"], weights_y=prev["weights"],
                           sigma=sigma)
        max_value = max(self.densratio.max_ratio(), 1.0)
        q = max(1 / max_value, 0.05)
        self.schedule.quantiles[self.state["round"] + 1] = q
        return q

    def _resolve_sample(self, backwards_index):
        if self.state["round"] + backwards_index < 0:
            return self._densityratio_initial_sample()
        sample = self._new_population if backwards_index == 0 \
            else self._populations[backwards_index]
        weights = sample.weights
        samples = sample.samples_array
        sigma_max = float(np.min(np.sqrt(np.diag(sample.meta["cov"]))))
        return dict(samples=samples, weights=weights, sigma_max=sigma_max)

    def _densityratio_initial_sample(self):
        n_samples = self._new_population.weights.shape[0]
        samples = self._prior.rvs(size=n_samples,
                                  key=self._round_key)
        weights = np.ones(n_samples)
        cov = np.atleast_2d(np.cov(samples.reshape(n_samples, -1),
                                   rowvar=False))
        return dict(samples=samples, weights=weights,
                    sigma_max=float(np.min(np.sqrt(np.diag(cov)))))
