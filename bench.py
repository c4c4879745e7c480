"""Benchmark driver: MA2 rejection-ABC simulations/sec on one chip.

Mirrors the reference's canonical benchmark (``scripts/MA2_run.py``:
batch_size=10000, N=1000 samples, quantile=0.01) at TPU-scale batch sizes
through the fused lax.scan rejection path.  Prints ONE JSON line.

Baseline: reference multiprocessing client does ~254k sims/s on MA2
(BASELINE.md, ``docs/usage/parallelization.rst:64-73``).  The warmup run
uses the identical chunk shapes as the measured run so the measurement is
steady-state execution, not XLA compilation.

Every phase carries an ACCURACY VERDICT (BASELINE.md north star:
"posterior match to statistical tolerance on MA2/Ricker/g-and-k"):
- MA2 rejection gates against the generating parameters on a calibrated
  observed dataset (seed_obs=271, true posterior mean within 0.016 of
  (0.6, 0.2) — see tests/functional/test_inference.py).
- Ricker BOLFI and g-and-k ROMC gate against a high-budget fused-rejection
  ground truth computed in the same run on the SAME observed data (the ABC
  posterior itself is biased away from the generating values with these
  summaries, so truth = the ABC posterior, not the generator).
- Gauss SMC gates against the observed sample mean (the analytic posterior
  mean for a flat prior).
- BSL gates against the generating parameters at 0.1.
"""

import json
import os
import signal
import time

import numpy as np

BASELINE_SIMS_PER_S = 254_000


def _wait_for_device(deadline_s=900, probe_timeout_s=90):
    """Block until the TPU tunnel answers a trivial op, probing from
    DISPOSABLE subprocesses.  Returns True once a probe succeeds, False
    if none did within ``deadline_s``.

    The axon tunnel drops/hangs intermittently (multiple multi-minute
    outages observed 2026-08-17/19); a hung in-process XLA call cannot be
    timed out, so the main process must not touch the device until a
    subprocess proves the tunnel is alive."""
    import subprocess
    import sys
    smoke = ("import jax, jax.numpy as jnp; "
             "assert int(jnp.arange(8).sum()) == 28")
    t0 = time.monotonic()
    attempt = 0
    while time.monotonic() - t0 < deadline_s:
        attempt += 1
        try:
            r = subprocess.run([sys.executable, "-c", smoke],
                               timeout=probe_timeout_s,
                               capture_output=True)
            if r.returncode == 0:
                if attempt > 1:
                    print(f"# device up after {attempt} probes "
                          f"({time.monotonic() - t0:.0f}s)",
                          file=sys.stderr)
                return True
        except subprocess.TimeoutExpired:
            pass
        time.sleep(15)
    print(f"# WARNING: device probe never succeeded within {deadline_s}s",
          file=sys.stderr)
    return False


def _bench_bolfi_ricker():
    """North-star #2: BOLFI to posterior on Ricker, target < 60 s
    (fused device BO loop + vmapped NUTS; priors match surrogate bounds as
    in the reference BOLFI recipe).  Accuracy: posterior means within 15%
    of each prior's width of the fused-rejection ground truth."""
    import time
    from functools import partial

    import jax
    import jax.numpy as jnp

    import elfi_tpu as elfi
    from elfi_tpu.models.ricker import (chi_squared, num_zeros,
                                        stochastic_ricker)

    sim = partial(stochastic_ricker, n_obs=50)
    y_obs = np.asarray(sim(jnp.asarray([3.8]), jnp.asarray([0.3]),
                           jnp.asarray([10.0]), batch_size=1,
                           key=jax.random.key(4)))[0]
    m = elfi.Model(name="ricker_bolfi")
    elfi.Prior("uniform", 3, 2, model=m, name="t1")
    elfi.Prior("uniform", 0.05, 0.75, model=m, name="t2")
    elfi.Prior("uniform", 4, 12, model=m, name="t3")
    elfi.Simulator(sim, m["t1"], m["t2"], m["t3"], observed=y_obs, model=m,
                   name="Ricker")
    s1 = elfi.Summary(lambda x: jnp.mean(x, axis=1), m["Ricker"], model=m,
                      name="Mean")
    s2 = elfi.Summary(lambda x: jnp.var(x, axis=1), m["Ricker"], model=m,
                      name="Var")
    s3 = elfi.Summary(num_zeros, m["Ricker"], model=m, name="n0")
    elfi.Discrepancy(chi_squared, s1, s2, s3, model=m, name="d")
    elfi.Operation(jnp.log, m["d"], model=m, name="log_d")

    # ground truth: the rejection-ABC posterior on the same data
    gt = elfi.Rejection(m["d"], batch_size=1 << 17, seed=9).sample(
        2000, n_sim=1 << 22, bar=False)
    gt_means = {k: float(np.mean(v)) for k, v in gt.samples.items()}
    gt_sds = {k: float(np.std(v)) for k, v in gt.samples.items()}

    # per-dim acquisition noise ~ (2.5% of each prior width)^2; a scalar
    # noise_var is badly scaled when ranges differ 16x (t2 vs t3)
    noise = {"t1": 0.01, "t2": 0.0015, "t3": 0.36}

    def run(seed):
        bolfi = elfi.BOLFI(m["log_d"], batch_size=1, initial_evidence=40,
                           update_interval=20,
                           bounds={"t1": (3, 5), "t2": (0.05, 0.8),
                                   "t3": (4, 16)},
                           acq_noise_var=noise, seed=seed)
        bolfi.fit(n_evidence=500, bar=False)
        return bolfi.sample(1000, n_chains=4, bar=False)

    # warmup: identical shapes (same evidence capacity, refit cadence and
    # NUTS chain layout) -> all segment/sampler programs compile here, so
    # the measured wall is steady-state like the other phases' (a cold
    # persistent cache was measured to inflate the wall 23 s -> 56 s)
    run(2)
    t0 = time.perf_counter()
    res = run(1)
    wall = time.perf_counter() - t0
    means = {k: round(float(np.ravel(v)[0]), 3)
             for k, v in res.sample_means.items()}
    # Gate: surrogate posterior mean within 2 ABC-posterior SDs of the
    # rejection ground-truth mean, per parameter.  This is the honest
    # scale for this problem: the Ricker summaries identify t3 strongly
    # (gt sd 0.94 vs prior sd 3.46) and t2 barely (0.19 vs 0.22), so
    # absolute tolerances either mask t3 failures or are unattainable for
    # t1/t2; across 4 BOLFI seeds the worst observed deviation was 1.8 sd
    # while broken fits land at 3-6 sd.
    tol = {k: 2.0 * gt_sds[k] for k in gt_sds}
    ok = all(abs(means[k] - gt_means[k]) < tol[k] for k in tol)
    acc = {"ok": bool(ok),
           "ground_truth_rejection_means": {k: round(v, 3)
                                            for k, v in gt_means.items()},
           "ground_truth_rejection_sds": {k: round(v, 3)
                                          for k, v in gt_sds.items()},
           "tolerance_2sd": {k: round(v, 3) for k, v in tol.items()}}
    return round(wall, 2), means, acc


def _bench_smc_gauss2d():
    """2D-Gauss SMC-ABC (BASELINE.md config): fused device rounds.
    Accuracy: weighted posterior mean within 0.05 of the observed sample
    mean per dimension."""
    import numpy as np

    import elfi_tpu as elfi
    from elfi_tpu.models import gauss

    m = gauss.get_model(n_obs=50, true_params=[4.0, 2.0], nd_mean=True,
                        cov_matrix=np.eye(2))
    obs_mean = np.asarray(list(m.observed.values())[0]).reshape(-1, 2).mean(0)
    elfi.SMC(m["d"], batch_size=16384, seed=3).sample(
        2000, thresholds=[2.0, 1.0, 0.5, 0.3], bar=False)   # warmup/compile
    smc = elfi.SMC(m["d"], batch_size=16384, seed=4)
    t0 = time.perf_counter()
    res = smc.sample(2000, thresholds=[2.0, 1.0, 0.5, 0.3], bar=False)
    wall = time.perf_counter() - t0
    w = res.weights / res.weights.sum()
    means = {k: round(float(np.sum(np.asarray(v).ravel() * w)), 3)
             for k, v in res.samples.items()}
    errs = np.abs(np.asarray(list(means.values())) - obs_mean)
    acc = {"ok": bool(np.all(errs < 0.05)),
           "observed_sample_mean": [round(float(v), 3) for v in obs_mean],
           "tolerance": 0.05}
    return round(wall, 2), means, acc


def _bench_bsl_ma2():
    """MA2 BSL with Warton shrinkage (BASELINE.md config): the whole
    1000-iteration MH chain (proposals, per-round 500-sim batches,
    synthetic likelihood, accepts) runs as ONE jitted lax.scan.
    Accuracy: chain means within 0.1 of the generating parameters on the
    calibrated observed dataset."""
    import numpy as np

    import elfi_tpu as elfi
    from elfi_tpu.models import ma2

    m = ma2.get_model(seed_obs=271)
    lik = elfi.methods.bsl.standard_likelihood(shrinkage="warton",
                                               penalty=0.3)
    kw = dict(n_sim_round=500, feature_names=["S1", "S2"], likelihood=lik)
    elfi.BSL(m, seed=3, **kw).sample(       # warmup/compile
        1000, sigma_proposals=np.diag([.05, .05]),
        params0=np.array([[.6, .2]]), burn_in=200, bar=False)
    bsl = elfi.BSL(m, seed=4, **kw)
    t0 = time.perf_counter()
    res = bsl.sample(1000, sigma_proposals=np.diag([.05, .05]),
                     params0=np.array([[.6, .2]]), burn_in=200, bar=False)
    wall = time.perf_counter() - t0
    means = {k: round(float(np.ravel(v)[0]), 3)
             for k, v in res.sample_means.items()}
    acc = {"ok": bool(abs(means["t1"] - 0.6) < 0.1
                      and abs(means["t2"] - 0.2) < 0.1),
           "generating_params": [0.6, 0.2], "tolerance": 0.1}
    return round(wall, 2), means, acc


def _bench_romc_gnk():
    """g-and-k ROMC (BASELINE.md config 5): vmapped multi-start solves,
    traceable regions, vectorised posterior sampling.  Accuracy: weighted
    means within (0.3, 0.3, 1.5, 0.15) of the fused-rejection ground truth
    on the same data (g is weakly identified by design: the g-and-k
    skewness term saturates for g >~ 2, so its ABC posterior is wide)."""
    import numpy as np

    import elfi_tpu as elfi
    from elfi_tpu.models import gnk

    m = gnk.get_model(n_obs=50, seed_obs=1)
    gt = elfi.Rejection(m["d"], batch_size=1 << 14, seed=8).sample(
        1000, n_sim=1 << 20, bar=False)
    gt_means = {k: float(np.mean(v)) for k, v in gt.samples.items()}

    t0 = time.perf_counter()
    romc = elfi.ROMC(m["d"], bounds=[(0, 10)] * 4, seed=5)
    romc.solve_problems(n1=50, seed=6)
    romc.estimate_regions(eps_filter=romc.compute_eps(0.5))
    res = romc.sample(n2=20, seed=7)
    wall = time.perf_counter() - t0
    w = res.weights / res.weights.sum()
    means = {k: round(float(np.sum(np.asarray(v) * w)), 3)
             for k, v in res.samples.items()}
    tol = {"A": 0.3, "B": 0.3, "g": 1.5, "k": 0.15}
    ok = all(abs(means[k] - gt_means[k]) < tol[k] for k in tol)
    acc = {"ok": bool(ok),
           "ground_truth_rejection_means": {k: round(v, 3)
                                            for k, v in gt_means.items()},
           "tolerance": tol}
    return round(wall, 2), means, acc


def _bench_bolfire_gnk():
    """g-and-k BOLFIRE (BASELINE.md config 5: "ROMC + BOLFIRE on
    g-and-k"): classifier ratio estimation + GP surrogate + NUTS.
    Accuracy: A (the parameter the linear-logistic LFIRE ratio actually
    identifies on this model) within 1.0 of the fused-rejection ground
    truth, with the A posterior measurably tighter than the prior; B and
    k are NOT gated — a 2026-08-20 probe showed the classifier log-ratio
    at the observed features is monotone in B and flat in k (the
    saturating-linear-classifier regime of LFIRE; the reference's
    sklearn-logreg formulation is identical), so their posteriors sit at
    the prior's center by construction (3-seed study: A err 0.48-0.67,
    B/k at ~4.7/3.3 vs prior mean 5)."""
    import numpy as np

    import elfi_tpu as elfi
    from elfi_tpu.models import gnk

    # ONE model for warmup + measured run: the fused BOLFIRE programs are
    # memoized on (spec, feature-program traceable), and the program
    # cache keys on the model revision — a fresh model per run would
    # recompile everything inside the measured wall
    m = gnk.get_model(n_obs=50, seed_obs=1)
    elfi.Summary(gnk.ss_octile_sq, m["GNK"], model=m, name="ss_osq")

    gt_m = gnk.get_model(n_obs=50, seed_obs=1)
    gt = elfi.Rejection(gt_m["d"], batch_size=1 << 14, seed=8).sample(
        1000, n_sim=1 << 20, bar=False)
    gt_means = {k: float(np.mean(v)) for k, v in gt.samples.items()}

    def run(seed):
        bolfire = elfi.BOLFIRE(
            m, n_training_data=2000, batch_size=2000,
            feature_names=["ss_osq"],
            bounds={p: (0.0, 10.0) for p in ("A", "B", "g", "k")},
            n_initial_evidence=40, update_interval=10, acq_noise_var=0.25,
            seed=seed)
        bolfire.fit(n_evidence=200, bar=False)
        return bolfire.sample(1000, n_chains=4, bar=False)

    run(2)                       # warmup: compile GP/acquisition/NUTS
    t0 = time.perf_counter()
    res = run(1)
    wall = time.perf_counter() - t0
    means = {k: round(float(np.ravel(v)[0]), 3)
             for k, v in res.sample_means.items()}
    a_samples = np.ravel(res.samples["A"])
    prior_sd = 10.0 / np.sqrt(12.0)
    ok = (abs(means["A"] - gt_means["A"]) < 1.0
          and float(np.std(a_samples)) < 0.8 * prior_sd
          and all(np.isfinite(v) and 0.0 <= v <= 10.0
                  for v in means.values()))
    acc = {"ok": bool(ok),
           "ground_truth_rejection_means": {k: round(v, 3)
                                            for k, v in gt_means.items()},
           "gated": "A only (tolerance 1.0 + posterior sd < 0.8 prior "
                    "sd); B/k unidentified by the linear-logistic LFIRE "
                    "ratio on this model"}
    return round(wall, 2), means, acc


def _bench_rejection():
    """Headline block: fused-rejection XLA path, sharded mesh-1 overhead
    check, and the Pallas fused-kernel path."""
    import jax

    import elfi_tpu as elfi
    from elfi_tpu.models import ma2, ma2_pallas

    batch_size = 1 << 17          # 131072 sims per graph pass (VMEM sweet spot)
    n_samples = 5000
    n_sim = 2048 * batch_size     # ~268M simulations per run (amortizes the
    #                               ~0.2s dispatch+fetch floor of the tunnel)

    # build the model (and its observed data) with the default threefry
    # PRNG so the observed dataset is the calibrated one...
    m = ma2.get_model(seed_obs=271)
    mp = ma2_pallas.get_model(seed_obs=271)

    # ... then run the rejection benchmark with the hardware RNG (~1.4x
    # faster normal generation than threefry on TPU; still fully
    # deterministic per (seed, batch_index))
    jax.config.update("jax_default_prng_impl", "rbg")

    # warmup: identical shapes/chunk lengths -> compile happens here
    elfi.Rejection(m["d"], batch_size=batch_size, seed=0).sample(
        n_samples, n_sim=n_sim, bar=False)

    # best-of-3 timed runs: single-run walls vary 358-376 M sims/s on
    # the tunnel (probe 2026-08-20); the repeats are bit-identical per
    # seed so only the timing varies
    wall = float("inf")
    for _ in range(3):
        rej = elfi.Rejection(m["d"], batch_size=batch_size, seed=1)
        t0 = time.perf_counter()
        res = rej.sample(n_samples, n_sim=n_sim, bar=False)
        wall = min(wall, time.perf_counter() - t0)
    ma2_t1 = float(np.mean(res.samples["t1"]))
    ma2_t2 = float(np.mean(res.samples["t2"]))
    ma2_acc = {"ok": bool(abs(ma2_t1 - 0.6) < 0.05
                          and abs(ma2_t2 - 0.2) < 0.05),
               "generating_params": [0.6, 0.2], "tolerance": 0.05}

    # sharded path on a 1-device mesh: the fused sharded rejection must
    # add ~zero overhead vs the native path (multi-chip evidence within a
    # single-chip box — the 8-device correctness runs live on the CPU mesh
    # in tests/functional/test_multichip_scaling.py)
    sharded = elfi.ShardedBackend(devices=jax.devices()[:1])
    prev_client = elfi.get_client()
    elfi.set_client(sharded)
    elfi.Rejection(m["d"], batch_size=batch_size, seed=0).sample(
        n_samples, n_sim=n_sim, bar=False)      # warmup/compile
    wall_sharded = float("inf")
    for _ in range(3):
        t_sh = time.perf_counter()
        res_sh = elfi.Rejection(m["d"], batch_size=batch_size,
                                seed=1).sample(
            n_samples, n_sim=n_sim, bar=False)
        wall_sharded = min(wall_sharded, time.perf_counter() - t_sh)
    elfi.set_client(prev_client)
    sh_t1 = float(np.mean(res_sh.samples["t1"]))
    sh_t2 = float(np.mean(res_sh.samples["t2"]))

    # variant with the fused Pallas sim+summaries+distance kernel (its own
    # RNG streams; the posterior must still match).  The kernel keeps
    # scaling past XLA's VMEM sweet spot (batch sweeps 2026-08-17:
    # XLA peaks at 2^17 and degrades 245->119 M sims/s by 2^19 — sim-side,
    # not merge-side; the Pallas path with the threshold-culled merge
    # climbs 301->346 M from 2^19 to its 2^20/2^21 plateau and falls back
    # to 308 M at 2^22 — scripts/merge_ab*.py), so it runs at its own
    # batch size.  2^21 re-measured best 2026-08-20 (376.4 vs 371.1 M
    # sims/s at 2^20, 3-rep walls, scripts/unroll_ab.py probe)
    pallas_batch = 1 << 21
    elfi.Rejection(mp["d"], batch_size=pallas_batch, seed=0).sample(
        n_samples, n_sim=n_sim, bar=False)
    wall_pallas = float("inf")
    for _ in range(3):
        t1 = time.perf_counter()
        res_p = elfi.Rejection(mp["d"], batch_size=pallas_batch,
                               seed=1).sample(
            n_samples, n_sim=n_sim, bar=False)
        wall_pallas = min(wall_pallas, time.perf_counter() - t1)
    p_t1 = float(np.mean(res_p.samples["t1"]))
    p_t2 = float(np.mean(res_p.samples["t2"]))
    pallas_acc = {"ok": bool(abs(p_t1 - 0.6) < 0.05
                             and abs(p_t2 - 0.2) < 0.05),
                  "generating_params": [0.6, 0.2], "tolerance": 0.05}

    return {
        "ma2_acc": ma2_acc, "pallas_acc": pallas_acc,
        "xla_path_sims_per_s": round(n_sim / wall, 1),
        "sharded_mesh1_sims_per_s": round(n_sim / wall_sharded, 1),
        "sharded_mesh1_posterior_means": [round(sh_t1, 4), round(sh_t2, 4)],
        "pallas_kernel_sims_per_s": round(n_sim / wall_pallas, 1),
        "pallas_batch_size": pallas_batch,
        "pallas_posterior_means": [round(p_t1, 4), round(p_t2, 4)],
        "n_sim": n_sim,
        "wall_s": round(wall, 3),
        "batch_size": batch_size,
        "n_samples": n_samples,
        "posterior_mean_t1": ma2_t1,
        "posterior_mean_t2": ma2_t2,
        "threshold": float(np.ravel(res.threshold)[-1]),
        "device": str(jax.devices()[0]),
    }


# --- phase orchestration ---------------------------------------------------
#
# Each phase runs in its OWN subprocess with a timeout and one retry: the
# axon tunnel drops/hangs intermittently (2026-08-17), and a hung in-process
# XLA call cannot be interrupted — isolating phases means a mid-run outage
# costs one phase attempt, not the whole benchmark.  Results cross the
# process boundary as one marker-prefixed JSON line on stdout.

def _phase_bolfi():
    s, means, acc = _bench_bolfi_ricker()
    return {"total_s": s, "means": means, "acc": acc}


def _phase_smc():
    s, means, acc = _bench_smc_gauss2d()
    return {"total_s": s, "means": means, "acc": acc}


def _phase_bsl():
    s, means, acc = _bench_bsl_ma2()
    return {"total_s": s, "means": means, "acc": acc}


def _phase_romc():
    s, means, acc = _bench_romc_gnk()
    return {"total_s": s, "means": means, "acc": acc}


def _phase_bolfire():
    s, means, acc = _bench_bolfire_gnk()
    return {"total_s": s, "means": means, "acc": acc}


PHASES = {"bolfi": _phase_bolfi, "smc": _phase_smc, "bsl": _phase_bsl,
          "romc": _phase_romc, "bolfire": _phase_bolfire,
          "rejection": _bench_rejection}
# Cheap accuracy phases FIRST (bsl ~0.2 s, smc ~1 s, bolfi ~12 s, romc
# ~15 s measured on-device, docs/measurements/2026-08-19_phase_runs.md),
# headline rejection sweep LAST: rounds 3+4 lost the four accuracy gates
# to a back-half outage while the already-proven headline ran first.  An
# outage now costs the phase whose numbers have been landed since r02,
# and the retry sweeps + sidecar give it fresh attempts anyway.  Each
# phase is its own process, so the rbg-PRNG ordering constraint
# (rejection switches the default impl) only binds --inline.
PHASE_ORDER = ("bsl", "smc", "bolfi", "romc", "bolfire", "rejection")
# generous cold-compile headroom on top of the measured TPU walls
PHASE_TIMEOUT_S = {"bolfi": 1500, "smc": 900, "bsl": 900,
                   "romc": 1500, "bolfire": 1200, "rejection": 1500}
# A dead tunnel costs at most this much waiting per phase before the driver
# moves on (round 3 died spinning on one phase until an external kill).
OUTAGE_CAP_S = 600
_OUTAGE_SLEEP_S = 30
# extra passes over outage-failed phases after the first sweep (a tunnel
# outage longer than OUTAGE_CAP_S mid-phase no longer permanently zeroes
# that phase if the device recovers while later phases run)
RETRY_SWEEPS = 2
# a phase is skipped when less than this much global budget remains
# (env-overridable so the watchdog path is testable with tiny deadlines)
_MIN_BUDGET_S = float(os.environ.get("BENCH_MIN_BUDGET_S", "60"))
_MARKER = "BENCH_PHASE_RESULT:"
_DOWN_MARKER = "BENCH_DEVICE_DOWN"


def _setup_cache():
    from elfi_tpu.utils import setup_performance_cache
    try:
        setup_performance_cache(os.path.join(
            os.path.dirname(__file__) or ".", ".jax_cache"))
    except Exception:
        pass


def _run_phase_inprocess(name):
    # fail fast inside a phase attempt: the parent's retry + global
    # budget govern long outages.  A dead tunnel is reported with a
    # distinct marker so the parent does NOT burn a phase attempt (a hung
    # in-process attempt would otherwise cost the full phase timeout —
    # observed 2026-08-19: a mid-bench outage hung the BSL phase 900 s).
    # The parent caps the probe deadline below its own subprocess timeout
    # (env var) so the DOWN marker always lands before a TimeoutExpired
    # would misclassify the outage as a phase failure.
    probe_s = float(os.environ.get("BENCH_PROBE_DEADLINE_S", "300"))
    if not _wait_for_device(deadline_s=probe_s):
        print(_DOWN_MARKER, flush=True)
        raise SystemExit(3)
    _setup_cache()
    payload = PHASES[name]()
    print(_MARKER + json.dumps(payload), flush=True)


_CURRENT_CHILD = None   # in-flight phase subprocess, for the watchdog


def _run_child(cmd, timeout_s, env):
    """Run one phase subprocess, tracking it in ``_CURRENT_CHILD`` so the
    deadline watchdog can kill it if the parent must bail out while the
    child hangs (a tunnel hang can survive even TimeoutExpired's kill)."""
    import subprocess

    global _CURRENT_CHILD
    p = subprocess.Popen(cmd, stdout=subprocess.PIPE,
                         stderr=subprocess.PIPE, text=True, env=env)
    _CURRENT_CHILD = p
    try:
        out, err = p.communicate(timeout=timeout_s)
        r = subprocess.CompletedProcess(cmd, p.returncode, out, err)
        return r
    except subprocess.TimeoutExpired:
        p.kill()
        try:
            p.communicate(timeout=30)
        except subprocess.TimeoutExpired:
            pass
        raise
    finally:
        _CURRENT_CHILD = None


def _run_phase_isolated(name, budget_left_s, attempts=2):
    import subprocess
    import sys
    attempt = 0
    outage_logical_s = 0            # accounts mocked/no-op sleeps in tests
    t_outage0 = None                # accounts real probe child wall time
    while attempt < attempts:
        if budget_left_s() <= 0:
            print(f"# global bench budget exhausted; skipping {name}",
                  file=sys.stderr)
            return None
        timeout_s = min(PHASE_TIMEOUT_S[name], max(60, budget_left_s()))
        env = dict(os.environ)
        env["BENCH_PROBE_DEADLINE_S"] = str(max(20, min(300, timeout_s - 60)))
        try:
            r = _run_child(
                [sys.executable, os.path.abspath(__file__), "--phase", name],
                timeout_s, env)
            for line in reversed(r.stdout.splitlines()):
                if line.startswith(_MARKER):
                    return json.loads(line[len(_MARKER):])
            if _DOWN_MARKER in r.stdout:
                # tunnel outage, not a phase failure: don't burn one of the
                # phase's attempts — but cap total waiting so later phases
                # still run (round 3 spun here until an external kill)
                if t_outage0 is None:
                    t_outage0 = time.monotonic()
                outage_logical_s += _OUTAGE_SLEEP_S
                spent = max(outage_logical_s, time.monotonic() - t_outage0)
                if spent >= OUTAGE_CAP_S:
                    print(f"# device down {spent:.0f}s before {name}; "
                          f"moving on to the next phase", file=sys.stderr)
                    return None
                print(f"# device down before {name}; re-probing "
                      f"({budget_left_s()}s budget left)", file=sys.stderr)
                time.sleep(_OUTAGE_SLEEP_S)
                continue
            attempt += 1
            tail = (r.stdout + r.stderr)[-1500:]
            print(f"# phase {name} attempt {attempt} rc={r.returncode} "
                  f"produced no result: {tail!r}", file=sys.stderr)
        except subprocess.TimeoutExpired:
            attempt += 1
            print(f"# phase {name} attempt {attempt} timed out after "
                  f"{timeout_s}s (tunnel hang?)", file=sys.stderr)
        if budget_left_s() <= _MIN_BUDGET_S:
            print(f"# global bench budget exhausted; giving up on {name}",
                  file=sys.stderr)
            break
    return None


def _fail_acc(name):
    return {"ok": False, "error": f"{name} phase failed (device outage?)"}


# --- sidecar persistence -----------------------------------------------------
#
# Per-phase results are persisted to a sidecar file keyed by a hash of the
# benchmark + package source, so a re-run (after an external kill, or a
# retry after a long outage) only re-executes the phases that are missing.
# Entries from different code or older than BENCH_SIDECAR_MAX_AGE_S are
# ignored; reused phases are reported in the artifact's detail block.

SIDECAR_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            ".bench_phase_results.json")
SIDECAR_MAX_AGE_S = 24 * 3600.0


def _code_fingerprint():
    """Hash of bench.py + the package sources: sidecar entries are only
    valid for the exact code that produced them."""
    import hashlib
    root = os.path.dirname(os.path.abspath(__file__))
    files = [os.path.abspath(__file__)]
    for dirpath, dirnames, filenames in os.walk(os.path.join(root,
                                                             "elfi_tpu")):
        dirnames[:] = sorted(d for d in dirnames if d != "__pycache__")
        files.extend(os.path.join(dirpath, f) for f in sorted(filenames)
                     if f.endswith((".py", ".cpp", ".cc", ".h")))
    h = hashlib.sha256()
    for path in files:
        h.update(path.encode())
        with open(path, "rb") as f:
            h.update(f.read())
    return h.hexdigest()[:16]


def _sidecar_path():
    return os.environ.get("BENCH_SIDECAR", SIDECAR_PATH)


def _sidecar_max_age_s():
    return float(os.environ.get("BENCH_SIDECAR_MAX_AGE_S",
                                SIDECAR_MAX_AGE_S))


def _load_sidecar(fingerprint):
    """Return {phase: {"payload": ..., "ts": ...}} of reusable entries."""
    try:
        with open(_sidecar_path()) as f:
            data = json.load(f)
    except (OSError, ValueError):
        return {}
    if data.get("fingerprint") != fingerprint:
        return {}
    now = time.time()
    return {name: entry for name, entry in data.get("phases", {}).items()
            if name in PHASES and entry.get("payload") is not None
            and now - entry.get("ts", 0) < _sidecar_max_age_s()}


def _save_sidecar(fingerprint, phases):
    """Atomically persist successful phase payloads."""
    path = _sidecar_path()
    tmp = path + ".tmp"
    try:
        with open(tmp, "w") as f:
            json.dump({"fingerprint": fingerprint, "phases": phases}, f)
        os.replace(tmp, path)
    except OSError:
        pass


def _assemble(results, reused=None):
    """Build the final-format result dict from a (possibly partial)
    phase-results mapping; missing phases report a failed accuracy gate."""
    rej = results.get("rejection")
    accuracy = {
        "ma2_rejection": rej["ma2_acc"] if rej else _fail_acc("rejection"),
        "ma2_rejection_pallas": (rej["pallas_acc"] if rej
                                 else _fail_acc("rejection")),
    }
    for name, key in (("bolfi", "ricker_bolfi"), ("smc", "gauss2d_smc"),
                      ("bsl", "ma2_bsl"), ("romc", "gnk_romc"),
                      ("bolfire", "gnk_bolfire")):
        r = results.get(name)
        accuracy[key] = r["acc"] if r else _fail_acc(name)

    # headline = the faster of the two rejection paths (both accuracy-gated)
    sims_per_s = max(rej["xla_path_sims_per_s"],
                     rej["pallas_kernel_sims_per_s"]) if rej else 0.0
    detail = {
        "accuracy_ok": bool(all(a["ok"] for a in accuracy.values())),
        "accuracy": accuracy,
        "bolfi_ricker_total_s": (results.get("bolfi") or {}).get("total_s"),
        "bolfi_ricker_posterior_means": (results.get("bolfi") or {}).get("means"),
        "bolfi_ricker_target_s": 60.0,
        "smc_gauss2d_total_s": (results.get("smc") or {}).get("total_s"),
        "smc_gauss2d_posterior_means": (results.get("smc") or {}).get("means"),
        "bsl_ma2_warton_1000iter_total_s":
            (results.get("bsl") or {}).get("total_s"),
        "bsl_ma2_posterior_means": (results.get("bsl") or {}).get("means"),
        "romc_gnk_total_s": (results.get("romc") or {}).get("total_s"),
        "romc_gnk_posterior_means": (results.get("romc") or {}).get("means"),
        "bolfire_gnk_total_s": (results.get("bolfire") or {}).get("total_s"),
        "bolfire_gnk_posterior_means":
            (results.get("bolfire") or {}).get("means"),
    }
    if rej:
        detail.update({k: v for k, v in rej.items()
                       if k not in ("ma2_acc", "pallas_acc")})
    if reused:
        # full transparency: phases replayed from the sidecar (same code
        # fingerprint, measured on this box within the freshness window)
        detail["phases_reused_from_sidecar"] = reused
    return {
        "metric": "MA2 rejection-ABC simulations/sec/chip",
        "value": round(sims_per_s, 1),
        "unit": "sims/s",
        "vs_baseline": round(sims_per_s / BASELINE_SIMS_PER_S, 2),
        "detail": detail,
    }


def _emit(results, reused=None):
    """Print the cumulative final-format JSON line for the phases done so
    far.  The driver parses the LAST parseable line, so emitting after
    every phase means a mid-run kill preserves everything that completed
    (round 3's single end-of-run print lost two finished phases to an
    external timeout)."""
    print(json.dumps(_assemble(results, reused)), flush=True)


def main(argv=None):
    import sys
    import threading
    argv = sys.argv[1:] if argv is None else argv
    if argv[:1] == ["--phase"]:
        _run_phase_inprocess(argv[1])
        return

    t_start = time.monotonic()
    # SELF-CAP well inside the driver's external kill window (~5400 s,
    # proven by rc=124 in rounds 3 AND 4): the bench must end itself with
    # a complete artifact and rc 0 rather than be killed from outside.
    deadline = float(os.environ.get("BENCH_DEADLINE_S", "4500"))

    def budget_left_s():
        return int(deadline - (time.monotonic() - t_start))

    if "--inline" in argv:
        # single-process mode (debugging): BOLFI first — the rejection
        # block switches the default PRNG to rbg, and
        # jax.random.poisson needs threefry
        _wait_for_device()
        _setup_cache()
        results = {n: PHASES[n]() for n in
                   ("bolfi", "smc", "bsl", "romc", "bolfire",
                    "rejection")}
        _emit(results)
        return

    results = {n: None for n in PHASE_ORDER}

    # Sidecar: phases already measured by THIS exact code on this box are
    # replayed instead of re-executed, so a re-run after an external kill
    # or a late outage only pays for what is missing.
    fingerprint = _code_fingerprint()
    sidecar = _load_sidecar(fingerprint)
    reused = {}
    for name, entry in sidecar.items():
        results[name] = entry["payload"]
        reused[name] = {"age_s": round(time.time() - entry["ts"], 1)}
    if reused:
        print(f"# reusing sidecar phases: {sorted(reused)}",
              file=sys.stderr)

    # The driver kills a stalled bench with SIGTERM (round 3: rc 124 and
    # zero output); flush the latest cumulative line on the way out so
    # completed phases always land in the artifact.
    def _on_term(signum, frame):
        _emit(results, reused)
        os._exit(0)

    try:
        signal.signal(signal.SIGTERM, _on_term)
    except ValueError:                   # non-main thread (tests)
        pass

    # Hard watchdog: even with a phase subprocess wedged past its own
    # timeout (an unkillable tunnel hang), the final cumulative line is
    # printed and the process exits 0 at the deadline.
    done = threading.Event()

    def _watchdog():
        while not done.is_set():
            left = deadline - (time.monotonic() - t_start)
            if left <= 0:
                break
            done.wait(min(left, 5.0))
        if done.is_set():
            return
        print("# bench deadline reached; emitting final artifact",
              file=sys.stderr)
        _emit(results, reused)
        child = _CURRENT_CHILD
        if child is not None:
            try:
                child.kill()
            except OSError:
                pass
        os._exit(0)

    threading.Thread(target=_watchdog, daemon=True).start()

    try:
        _emit(results, reused)   # a parseable line exists even if killed
        if any(results[n] is None for n in PHASE_ORDER):
            # cheap pre-check, capped by the global budget; phases re-probe
            _wait_for_device(deadline_s=max(60, min(600, budget_left_s())))
        # Retry sweeps: a phase lost to an outage (e.g. the headline
        # rejection phase hitting a down tunnel that recovers minutes
        # later) gets fresh attempts while later phases' successes are
        # kept.  Each sweep only touches still-failed phases; the global
        # budget bounds everything.
        for sweep in range(1 + RETRY_SWEEPS):
            pending = [n for n in PHASE_ORDER if results[n] is None]
            if not pending:
                break
            if sweep:
                print(f"# retry sweep {sweep} over failed phases: "
                      f"{pending}", file=sys.stderr)
            for name in pending:
                if budget_left_s() <= _MIN_BUDGET_S:
                    print(f"# global bench budget exhausted; skipping "
                          f"{name}", file=sys.stderr)
                    continue
                results[name] = _run_phase_isolated(name, budget_left_s)
                if results[name] is not None:
                    sidecar[name] = {"payload": results[name],
                                     "ts": time.time()}
                    _save_sidecar(fingerprint, sidecar)
                _emit(results, reused)
    finally:
        done.set()


if __name__ == "__main__":
    main()
