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


@partial(jax.jit, static_argnames=("target", "n_iter", "n_adapt",
                                   "max_depth"))
def _nuts_chain(key, x0, target, n_iter, n_adapt, target_prob, max_depth,
                stepsize0):
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
    return xs


def nuts(n_iter, params0, target, grad_target=None, n_adapt=None,
         target_prob=0.6, max_depth=5, seed=0, stepsize=None, key=None,
         **kwargs):
    """Sample a traceable log-density with NUTS (reference API,
    ``mcmc.py:114-162``); returns (n_iter, d) including adaptation."""
    params0 = jnp.atleast_1d(jnp.asarray(params0, jnp.float32))
    n_adapt = n_adapt if n_adapt is not None else n_iter // 2
    if key is None:
        key = jax.random.key(seed)
    t0 = float(np.asarray(target(params0)))
    if not np.isfinite(t0):
        raise ValueError(f"NUTS: bad initialization point {params0}, "
                         "logpdf -> -inf")
    xs = _nuts_chain(key, params0, target, int(n_iter), int(n_adapt),
                     float(target_prob), int(max_depth),
                     jnp.float32(stepsize or 0.0))
    return np.asarray(xs)


def nuts_chains(n_iter, x0s, target, n_adapt=None, target_prob=0.6,
                max_depth=5, seed=0, stepsize=None, mesh=None):
    """Run several NUTS chains vmapped on device; returns
    (n_chains, n_iter, d).

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
    runner = jax.vmap(lambda k, x: _nuts_chain(
        k, x, target, int(n_iter), int(n_adapt), float(target_prob),
        int(max_depth), jnp.float32(stepsize or 0.0)))
    if mesh is not None and n_chains % mesh.devices.size == 0:
        from jax.sharding import NamedSharding
        from jax.sharding import PartitionSpec as P
        sh = NamedSharding(mesh, P(mesh.axis_names[0]))
        keys = jax.device_put(keys, sh)
        x0s = jax.device_put(x0s, sh)
    return np.asarray(runner(keys, x0s))


@partial(jax.jit, static_argnames=("target", "n_total"))
def _metropolis_chain(key, x0, target, n_total, sigma):
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


def metropolis(n_samples, params0, target, sigma_proposals, warmup=0, seed=0,
               key=None):
    """Random-walk Metropolis with Gaussian proposals (reference
    ``mcmc.py:379-429``)."""
    params0 = jnp.atleast_1d(jnp.asarray(params0, jnp.float32))
    sigma = jnp.asarray(sigma_proposals, jnp.float32)
    if key is None:
        key = jax.random.key(seed)
    t0 = float(np.asarray(target(params0)))
    if not np.isfinite(t0):
        raise ValueError(f"Metropolis: bad initialization point {params0}")
    xs = _metropolis_chain(key, params0, target, int(n_samples + warmup),
                           sigma)
    return np.asarray(xs)[warmup:]


def metropolis_chains(n_samples, x0s, target, sigma_proposals, warmup=0,
                      seed=0):
    x0s = jnp.atleast_2d(jnp.asarray(x0s, jnp.float32))
    sigma = jnp.asarray(sigma_proposals, jnp.float32)
    keys = jax.random.split(jax.random.key(seed), x0s.shape[0])
    runner = jax.vmap(lambda k, x: _metropolis_chain(
        k, x, target, int(n_samples + warmup), sigma))
    return np.asarray(runner(keys, x0s))[:, warmup:]


# ---------------------------------------------------------------------------
# diagnostics (numpy; reference ``mcmc.py:13-111``)
# ---------------------------------------------------------------------------

def eff_sample_size(chains):
    """Multi-chain ESS via FFT autocovariance + variogram."""
    chains = np.atleast_2d(chains)
    n_chains, n_samples = chains.shape
    means = np.mean(chains, axis=1)
    variances = np.var(chains, ddof=1, axis=1)
    var_between = 0 if n_chains == 1 else n_samples * np.var(means, ddof=1)
    var_within = np.mean(variances)
    var_pooled = ((n_samples - 1.) * var_within + var_between) / n_samples
    if var_pooled == 0:  # constant chain
        return float(n_chains * n_samples)
    n_padded = int(2 ** np.ceil(1 + np.log2(n_samples)))
    freqs = np.fft.rfft(chains - means[:, None], n_padded)
    autocov = np.fft.irfft(np.abs(freqs) ** 2)[:, :n_samples].real
    autocov = autocov / np.arange(n_samples, 0, -1)
    estimator_sum = 0.
    lag = 1
    while lag < n_samples:
        temp = 1. - (var_within - np.mean(autocov[:, lag])) / var_pooled
        if temp >= 0:
            estimator_sum += temp
            lag += 1
        else:
            break
    return n_chains * n_samples / (1. + 2. * estimator_sum)


def gelman_rubin_statistic(chains):
    """Split-chain potential scale reduction factor R-hat."""
    chains = np.atleast_2d(chains)
    n_chains, n_samples = chains.shape
    n_chains *= 2
    n_samples //= 2
    chains = chains[:, :2 * n_samples].reshape((n_chains, n_samples))
    means = np.mean(chains, axis=1)
    variances = np.var(chains, ddof=1, axis=1)
    var_between = n_samples * np.var(means, ddof=1)
    var_within = np.mean(variances)
    var_pooled = ((n_samples - 1.) * var_within + var_between) / n_samples
    return np.sqrt(var_pooled / var_within)
