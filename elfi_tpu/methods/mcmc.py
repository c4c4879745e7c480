"""MCMC samplers in pure JAX: NUTS, Metropolis, and chain diagnostics.

The reference implements recursive NUTS (Hoffman & Gelman Alg. 6) in Python
(``elfi/methods/mcmc.py:114-376``) and farms chains to client workers.  Here
the sampler is an ITERATIVE formulation — the recursion is flattened into
``lax.while_loop``s with a fixed-size checkpoint stack for the sub-U-turn
tests (store left endpoints at stack slot popcount(i) on even leaves, test
slots [popcount-trailing_ones, popcount) on odd leaves) — so a whole chain
compiles to one XLA program, and chains run vmapped on one chip instead of
one-per-worker.

The target log-density must be JAX-traceable; its gradient comes from
``jax.grad`` (the reference requires a hand-provided ``grad_target``).
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

__all__ = ["nuts", "nuts_chains", "metropolis", "metropolis_chains",
           "eff_sample_size", "gelman_rubin_statistic"]

_DIVERGENCE = 1000.0  # reference's diverging-error slack (mcmc.py:330)


def _popcount(n):
    """Branch-free SWAR popcount (int32)."""
    n = n - ((n >> 1) & 0x55555555)
    n = (n & 0x33333333) + ((n >> 2) & 0x33333333)
    n = (n + (n >> 4)) & 0x0F0F0F0F
    return (n * 0x01010101) >> 24


def _trailing_ones(n):
    """Number of trailing 1-bits: popcount(n ^ (n+1)) - 1."""
    return _popcount(n ^ (n + 1)) - 1


def _leapfrog(grad, x, m, step):
    # zero non-finite gradients (outside prior support the logpdf is -inf
    # and autodiff yields nan); matches the reference's sanitized
    # gradient_logpdf (``elfi/model/extensions.py:217-230``) — otherwise a
    # single boundary touch poisons the whole trajectory with nans
    def sg(v):
        return jnp.where(jnp.isfinite(v), v, 0.0)

    m1 = m + 0.5 * step * sg(grad(x))
    x1 = x + step * m1
    m1 = m1 + 0.5 * step * sg(grad(x1))
    return x1, m1


def _uturn(x_l, x_r, m_l, m_r):
    dx = x_r - x_l
    return (jnp.dot(dx, m_l) < 0) | (jnp.dot(dx, m_r) < 0)


def _build_subtree(key, target, grad, x0, m0, direction, depth, step,
                   log_slice, log_joint0, max_depth):
    """Build one subtree of 2^depth leaves from edge state (x0, m0),
    iteratively with checkpointed sub-U-turn tests.

    Returns (x_edge, m_edge, x_prop, n_ok, sub_ok, mh_sum, n_steps).
    """
    d = x0.shape[0]
    n_leaves = jnp.int32(1) << depth
    eff_step = direction * step
    x_ckpt = jnp.zeros((max_depth + 1, d))
    m_ckpt = jnp.zeros((max_depth + 1, d))

    def cond(state):
        (i, _, _, _, _, ok, _, _, _, _, _) = state
        return ok & (i < n_leaves)

    def body(state):
        (i, x, m, x_prop, n_ok, ok, mh_sum, n_steps, xc, mc, key) = state
        x1, m1 = _leapfrog(grad, x, m, eff_step)
        logp1 = target(x1)
        log_joint = logp1 - 0.5 * jnp.dot(m1, m1)
        leaf_ok = log_slice < (_DIVERGENCE + log_joint)
        n_ok_leaf = (log_slice <= log_joint).astype(jnp.float32)
        mh = jnp.where(leaf_ok,
                       jnp.minimum(1.0, jnp.exp(log_joint - log_joint0)), 0.0)
        # progressive (reservoir) proposal over accepted leaves
        key, ksel = jax.random.split(key)
        take = jax.random.uniform(ksel) < n_ok_leaf / jnp.maximum(
            n_ok + n_ok_leaf, 1.0)
        x_prop = jnp.where(leaf_ok & take, x1, x_prop)
        n_ok = n_ok + n_ok_leaf

        # checkpoint bookkeeping for sub-U-turn tests
        pc = _popcount(i)
        is_even = (i % 2) == 0
        xc = jnp.where(is_even, xc.at[pc].set(x1), xc)
        mc = jnp.where(is_even, mc.at[pc].set(m1), mc)

        to = _trailing_ones(i)
        idx_max = pc - 1
        idx_min = pc - to

        # vectorised sub-U-turn test against all active checkpoints;
        # time-align the displacement: for leftward (direction=-1) subtrees
        # the checkpoint is the LATER time point
        slots = jnp.arange(max_depth + 1)
        valid = (slots >= idx_min) & (slots <= idx_max)
        dxs = direction * (x1[None, :] - xc)            # (D+1, d)
        t = (jnp.einsum("jd,jd->j", dxs, mc) < 0) | (dxs @ m1 < 0)
        turning = jnp.where(is_even, jnp.bool_(False), jnp.any(valid & t))
        ok = leaf_ok & (~turning)
        return (i + 1, x1, m1, x_prop, n_ok, ok, mh_sum + mh, n_steps + 1.0,
                xc, mc, key)

    init = (jnp.int32(0), x0, m0, x0, jnp.float32(0.0), jnp.bool_(True),
            jnp.float32(0.0), jnp.float32(0.0), x_ckpt, m_ckpt, key)
    (_, x_e, m_e, x_prop, n_ok, ok, mh_sum, n_steps, _, _, _) = \
        jax.lax.while_loop(cond, body, init)
    return x_e, m_e, x_prop, n_ok, ok, mh_sum, jnp.maximum(n_steps, 1.0)


def _nuts_iteration(key, target, grad, x, step, max_depth):
    """One NUTS transition; returns (x', accept_stat)."""
    d = x.shape[0]
    key, km, ke = jax.random.split(key, 3)
    m0 = jax.random.normal(km, (d,))
    logp = target(x)
    log_joint0 = logp - 0.5 * jnp.dot(m0, m0)
    log_slice = log_joint0 - jax.random.exponential(ke)

    def cond(state):
        (depth, _, _, _, _, _, _, ok, _, _, _) = state
        return ok & (depth <= max_depth)

    def body(state):
        (depth, x_l, m_l, x_r, m_r, x_prop, n_ok, ok, mh, ns, key) = state
        key, kd, kb, ka = jax.random.split(key, 4)
        go_right = jax.random.uniform(kd) < 0.5
        direction = jnp.where(go_right, 1.0, -1.0)
        x0 = jnp.where(go_right, x_r, x_l)
        m0 = jnp.where(go_right, m_r, m_l)
        x_e, m_e, x_sub, n_sub, sub_ok, mh_sum, n_steps = _build_subtree(
            kb, target, grad, x0, m0, direction, depth, step, log_slice,
            log_joint0, max_depth)
        x_l = jnp.where(go_right, x_l, x_e)
        m_l = jnp.where(go_right, m_l, m_e)
        x_r = jnp.where(go_right, x_e, x_r)
        m_r = jnp.where(go_right, m_e, m_r)
        accept = sub_ok & (jax.random.uniform(ka)
                           < n_sub / jnp.maximum(n_ok, 1.0))
        x_prop = jnp.where(accept, x_sub, x_prop)
        n_ok = n_ok + n_sub
        ok = sub_ok & (~_uturn(x_l, x_r, m_l, m_r))
        return (depth + 1, x_l, m_l, x_r, m_r, x_prop, n_ok, ok,
                mh_sum, n_steps, key)

    init = (jnp.int32(0), x, m0, x, m0, x, jnp.float32(1.0), jnp.bool_(True),
            jnp.float32(0.0), jnp.float32(1.0), key)
    (_, _, _, _, _, x_new, _, _, mh, ns, _) = jax.lax.while_loop(cond, body,
                                                                 init)
    return x_new, mh / ns


def _find_stepsize(key, target, grad, x0):
    """Trial-leapfrog initial stepsize search (reference
    ``mcmc.py:175-220``), as a traceable while_loop."""
    logp0 = target(x0)
    m0 = jax.random.normal(key, x0.shape)
    joint0 = logp0 - 0.5 * jnp.dot(m0, m0)

    def joint_at(step):
        x1, m1 = _leapfrog(grad, x0, m0, step)
        return target(x1) - 0.5 * jnp.dot(m1, m1)

    # find a finite starting stepsize
    def cond_f(c):
        i, step, j1 = c
        return (~jnp.isfinite(j1)) & (i < 20)

    def body_f(c):
        i, step, _ = c
        step = jnp.exp(-(i + 1.0))
        return i + 1, step, joint_at(step)

    _, step, j1 = jax.lax.while_loop(cond_f, body_f,
                                     (jnp.float32(0.0), jnp.float32(1.0),
                                      joint_at(jnp.float32(1.0))))
    plus = jnp.exp(j1 - joint0) > 0.5
    factor = jnp.where(plus, 2.0, 0.5)
    sign = jnp.where(plus, 1.0, -1.0)

    def cond_d(c):
        step, j1, it = c
        return (factor * jnp.exp(sign * (j1 - joint0)) > 1.0) & (it < 50)

    def body_d(c):
        step, _, it = c
        step = step * factor
        return step, joint_at(step), it + 1

    step, _, _ = jax.lax.while_loop(cond_d, body_d,
                                    (step, j1, jnp.int32(0)))
    return step


def _nuts_chain_body(key, x0, target, n_iter, n_adapt, target_prob,
                     max_depth, stepsize0, target_args=(), scales=None):
    """Unjitted single-chain NUTS implementation.

    ``target_args`` is a pytree of per-run data threaded through as jit
    ARGUMENTS by the jitted wrappers below.  Closing the target over that
    data instead (the pre-round-4 design) bakes it into the program as
    constants, so every new GP fit produced a byte-different payload —
    a full remote XLA compile (9-70 s measured on the tunnel) hiding
    inside every BOLFI ``sample()`` call.

    ``scales`` (optional, shape (d,)): diagonal preconditioner.  The chain
    runs in z = x / scales coordinates with unit-mass momentum — exactly a
    diagonal mass matrix M = diag(1/scales^2) — and the returned draws are
    mapped back to x.  Without it a single dual-averaged stepsize must fit
    the NARROWEST parameter, so wide parameters mix arbitrarily slowly
    (Ricker's 16x bounds-width spread left t3 under-sampled).  The
    reference's NUTS has no mass matrix either (``elfi/methods/mcmc.py``);
    this is a capability it lacks.  ``scales=None`` is bit-identical to
    the unpreconditioned sampler."""
    if target_args:
        base = target
        target = lambda x: base(x, *target_args)   # noqa: E731
    if scales is not None:
        unscaled = target
        target = lambda z: unscaled(z * scales)    # noqa: E731
        x0 = x0 / scales
    grad = jax.grad(target)
    key, kf = jax.random.split(key)
    step0 = jnp.where(stepsize0 > 0, stepsize0,
                      _find_stepsize(kf, target, grad, x0))

    mu = jnp.log(10.0 * step0)
    shrinkage, ii_offset, discount = 0.05, 10.0, -0.75

    def scan_body(carry, ii):
        x, step, log_avg_step, accept_ratio, key = carry
        key, kit = jax.random.split(key)
        x, astat = _nuts_iteration(kit, target, grad, x, step, max_depth)
        # dual-averaging stepsize adaptation (reference mcmc.py:281-296)
        in_adapt = ii <= n_adapt
        ar = (1.0 - 1.0 / (ii + ii_offset)) * accept_ratio + \
            (target_prob - astat) / (ii + ii_offset)
        log_step = mu - jnp.sqrt(ii) / shrinkage * ar
        las = ii ** discount * log_step + (1.0 - ii ** discount) * log_avg_step
        step = jnp.where(in_adapt, jnp.exp(log_step),
                         jnp.where(ii == n_adapt + 1, jnp.exp(log_avg_step),
                                   step))
        accept_ratio = jnp.where(in_adapt, ar, accept_ratio)
        log_avg_step = jnp.where(in_adapt, las, log_avg_step)
        return (x, step, log_avg_step, accept_ratio, key), x

    iis = jnp.arange(1, n_iter + 1, dtype=jnp.float32)
    (_, _, _, _, _), xs = jax.lax.scan(
        scan_body, (x0, step0, jnp.float32(0.0), jnp.float32(0.0), key), iis)
    return xs if scales is None else xs * scales


_nuts_chain = jax.jit(_nuts_chain_body,
                      static_argnames=("target", "n_iter", "n_adapt",
                                       "max_depth"))


@partial(jax.jit, static_argnames=("target", "n_iter", "n_adapt",
                                   "max_depth"))
def _nuts_chains_jit(keys, x0s, target, n_iter, n_adapt, target_prob,
                     max_depth, stepsize0, target_args, scales=None):
    """All chains as ONE top-level jitted vmap.  The cache key is the
    static ``target`` identity; per-fit data (GP factors, thresholds,
    prior boxes) must flow through ``target_args`` so a stable target
    function compiles exactly once per process — and, because the traced
    payload then contains no fit-dependent constants, hits the persistent
    compile cache across processes too."""
    def one(k, x):
        return _nuts_chain_body(k, x, target, n_iter, n_adapt, target_prob,
                                max_depth, stepsize0, target_args, scales)
    return jax.vmap(one)(keys, x0s)


def nuts(n_iter, params0, target, grad_target=None, n_adapt=None,
         target_prob=0.6, max_depth=5, seed=0, stepsize=None, key=None,
         target_args=(), scales=None, **kwargs):
    """Sample a traceable log-density with NUTS (reference API,
    ``mcmc.py:114-162``); returns (n_iter, d) including adaptation.

    ``scales``: optional per-parameter widths used as a diagonal mass
    matrix (see ``_nuts_chain_body``)."""
    params0 = jnp.atleast_1d(jnp.asarray(params0, jnp.float32))
    n_adapt = n_adapt if n_adapt is not None else n_iter // 2
    if key is None:
        key = jax.random.key(seed)
    if scales is not None:
        scales = jnp.asarray(scales, jnp.float32)
    t0 = float(np.asarray(target(params0, *target_args)))
    if not np.isfinite(t0):
        raise ValueError(f"NUTS: bad initialization point {params0}, "
                         "logpdf -> -inf")
    xs = _nuts_chain(key, params0, target, int(n_iter), int(n_adapt),
                     float(target_prob), int(max_depth),
                     jnp.float32(stepsize or 0.0), target_args, scales)
    return np.asarray(xs)


def nuts_chains(n_iter, x0s, target, n_adapt=None, target_prob=0.6,
                max_depth=5, seed=0, stepsize=None, mesh=None,
                target_args=(), scales=None):
    """Run several NUTS chains vmapped on device; returns
    (n_chains, n_iter, d).

    ``target_args``: pytree of per-run data, passed to
    ``target(x, *target_args)`` as traced jit arguments.  Pass fit-varying
    data here (NOT closed over) so repeated sampling against re-fitted
    surrogates reuses one compiled program.

    With ``mesh`` given (and ``n_chains`` divisible by the mesh size) the
    chain axis is sharded across the mesh devices — the reference farms
    each chain as a separate client task (``bolfi.py:552-561``); here XLA
    partitions the one vmapped program over ICI.  Deterministic per seed
    and mesh; across different partitionings results are statistically
    equivalent, not bitwise (NUTS amplifies compilation-level float
    differences)."""
    x0s = jnp.atleast_2d(jnp.asarray(x0s, jnp.float32))
    n_chains = x0s.shape[0]
    n_adapt = n_adapt if n_adapt is not None else n_iter // 2
    keys = jax.random.split(jax.random.key(seed), n_chains)
    if scales is not None:
        scales = jnp.asarray(scales, jnp.float32)
    if mesh is not None and n_chains % mesh.devices.size == 0:
        from jax.sharding import NamedSharding
        from jax.sharding import PartitionSpec as P
        sh = NamedSharding(mesh, P(mesh.axis_names[0]))
        keys = jax.device_put(keys, sh)
        x0s = jax.device_put(x0s, sh)
    return np.asarray(_nuts_chains_jit(
        keys, x0s, target, int(n_iter), int(n_adapt), float(target_prob),
        int(max_depth), jnp.float32(stepsize or 0.0), target_args, scales))


def _metropolis_chain_body(key, x0, target, n_total, sigma, target_args=()):
    if target_args:
        base = target
        target = lambda x: base(x, *target_args)   # noqa: E731
    logp0 = target(x0)

    def body(carry, key_i):
        x, logp = carry
        k1, k2 = jax.random.split(key_i)
        prop = x + sigma * jax.random.normal(k1, x.shape)
        logp_prop = target(prop)
        accept = jnp.isfinite(logp_prop) & \
            (jnp.exp(logp_prop - logp) >= jax.random.uniform(k2))
        x = jnp.where(accept, prop, x)
        logp = jnp.where(accept, logp_prop, logp)
        return (x, logp), x

    keys = jax.random.split(key, n_total)
    _, xs = jax.lax.scan(body, (x0, logp0), keys)
    return xs


_metropolis_chain = jax.jit(_metropolis_chain_body,
                            static_argnames=("target", "n_total"))


@partial(jax.jit, static_argnames=("target", "n_total"))
def _metropolis_chains_jit(keys, x0s, target, n_total, sigma, target_args):
    def one(k, x):
        return _metropolis_chain_body(k, x, target, n_total, sigma,
                                      target_args)
    return jax.vmap(one)(keys, x0s)


def metropolis(n_samples, params0, target, sigma_proposals, warmup=0, seed=0,
               key=None, target_args=()):
    """Random-walk Metropolis with Gaussian proposals (reference
    ``mcmc.py:379-429``)."""
    params0 = jnp.atleast_1d(jnp.asarray(params0, jnp.float32))
    sigma = jnp.asarray(sigma_proposals, jnp.float32)
    if key is None:
        key = jax.random.key(seed)
    t0 = float(np.asarray(target(params0, *target_args)))
    if not np.isfinite(t0):
        raise ValueError(f"Metropolis: bad initialization point {params0}")
    xs = _metropolis_chain(key, params0, target, int(n_samples + warmup),
                           sigma, target_args)
    return np.asarray(xs)[warmup:]


def metropolis_chains(n_samples, x0s, target, sigma_proposals, warmup=0,
                      seed=0, target_args=()):
    x0s = jnp.atleast_2d(jnp.asarray(x0s, jnp.float32))
    sigma = jnp.asarray(sigma_proposals, jnp.float32)
    keys = jax.random.split(jax.random.key(seed), x0s.shape[0])
    return np.asarray(_metropolis_chains_jit(
        keys, x0s, target, int(n_samples + warmup), sigma,
        target_args))[:, warmup:]


# ---------------------------------------------------------------------------
# Chain diagnostics — split-chain ESS with Geyer initial-monotone-sequence
# truncation and split-R̂, following the Vehtari/Gelman/Simpson/Carpenter/
# Bürkner (2021) formulation, implemented in JAX and vectorised over a
# trailing parameter axis so diagnostics of vmapped device chains need no
# host loop.  The reference computes an unsplit per-lag variogram in a host
# while-loop instead (``elfi/methods/mcmc.py:13-111``).
# ---------------------------------------------------------------------------

def _split_halves(chains):
    """(m, n) chains -> (2m, n//2): first and last halves stacked (the
    middle draw is dropped when n is odd).  Splitting makes within-chain
    drift show up as between-chain variance in both diagnostics."""
    chains = np.atleast_2d(np.asarray(chains, np.float64))
    half = chains.shape[1] // 2
    return np.concatenate([chains[:, :half], chains[:, -half:]], axis=0)


@jax.jit
def _tau_and_rhat(split):
    """Integrated autocorrelation time τ and split-R̂ from (m, n) split
    chains of one scalar quantity.  Returns (τ, R̂)."""
    m, n = split.shape
    # circular-embedding FFT autocovariance, biased (1/n) normalisation
    centered = split - split.mean(axis=1, keepdims=True)
    spectrum = jnp.fft.rfft(centered, 2 * n, axis=1)
    acov = jnp.fft.irfft(jnp.abs(spectrum) ** 2, 2 * n, axis=1)[:, :n] / n
    within = jnp.mean(acov[:, 0]) * n / (n - 1.0)
    between = jnp.var(split.mean(axis=1), ddof=1)  # = B/n
    total = within * (n - 1.0) / n + between       # marginal variance var⁺
    rhat = jnp.sqrt(total / within)
    # combined autocorrelation at each lag, all chains pooled
    rho = 1.0 - (within - jnp.mean(acov, axis=0)) / total
    # Geyer 1992: Γ_k = ρ_{2k} + ρ_{2k+1} is positive and non-increasing
    # for a reversible chain; truncate at the first non-positive pair and
    # clamp to the running minimum, entirely with masked vector ops
    pairs = rho[0:n - n % 2:2] + rho[1::2]
    alive = jnp.cumprod(pairs > 0.0).astype(bool)
    capped = jax.lax.associative_scan(jnp.minimum, pairs)
    tau = -1.0 + 2.0 * jnp.sum(jnp.where(alive, jnp.maximum(capped, 0.0),
                                         0.0))
    # (near-)constant chains: the variance is pure float rounding (XLA's
    # reduction order makes "exactly zero" unattainable under jit), and τ/R̂
    # are meaningless — define τ=1, R̂=1.  Also fall back to τ=1 when no
    # Geyer pair survives (ρ₁ ≈ -1 is only reachable degenerately).
    degenerate = total <= 1e-10 * (jnp.mean(split ** 2) + 1e-30)
    tau = jnp.where(degenerate | ~jnp.isfinite(tau) | (tau <= 0.0), 1.0, tau)
    rhat = jnp.where(degenerate | ~jnp.isfinite(rhat), 1.0, rhat)
    return tau, rhat


_tau_and_rhat_vec = jax.jit(jax.vmap(_tau_and_rhat, in_axes=2))


def eff_sample_size(chains):
    """Effective sample size of MCMC draws.

    ``chains`` is (n_samples,), (n_chains, n_samples), or
    (n_chains, n_samples, n_params) — the latter returns one ESS per
    parameter as an array, computed in a single vectorised device call.
    Capability parity with the reference's scalar ESS
    (``elfi/methods/mcmc.py:13-63``) but a split-chain Geyer estimator.
    """
    arr = np.asarray(chains, np.float64)
    if arr.ndim == 3:
        taus, _ = _tau_and_rhat_vec(jnp.concatenate(
            [arr[:, :arr.shape[1] // 2], arr[:, -(arr.shape[1] // 2):]],
            axis=0))
        taus = np.asarray(taus)
        size = arr.shape[0] * arr.shape[1]
        return np.minimum(size / np.maximum(taus, 1e-12),
                          size * np.log10(max(size, 10.0)))
    split = _split_halves(arr)
    tau, _ = _tau_and_rhat(split)
    size = split.shape[0] * split.shape[1]
    return float(min(size / max(float(tau), 1e-12),
                     size * np.log10(max(size, 10.0))))


def gelman_rubin_statistic(chains):
    """Split-chain potential-scale-reduction factor R̂ (same split-halves
    convention as :func:`eff_sample_size`; reference
    ``elfi/methods/mcmc.py:66-111``)."""
    arr = np.asarray(chains, np.float64)
    if arr.ndim == 3:
        _, rhats = _tau_and_rhat_vec(jnp.concatenate(
            [arr[:, :arr.shape[1] // 2], arr[:, -(arr.shape[1] // 2):]],
            axis=0))
        return np.asarray(rhats)
    _, rhat = _tau_and_rhat(_split_halves(arr))
    return float(rhat)
