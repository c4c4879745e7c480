"""ROMC: Robust Optimisation Monte Carlo (Ikonomov & Gutmann 2019;
reference ``elfi/methods/inference/romc.py`` + ``posteriors.py:393-795``).

TPU-native redesign.  In the reference each of the n1 deterministic
objectives is a Python closure over ``model.generate`` with a frozen numpy
seed, optimised one-at-a-time with scipy Nelder-Mead and differentiated
with numdifftools.  Here the frozen-seed objective is a TRACEABLE JAX
function of theta (the nuisance randomness is a frozen PRNG key), so:

- all n1 optimisation problems are solved by ONE vmapped jitted Adam
  program with exact autodiff gradients (``_solve_all``);
- Hessians for the region rotations come from ``jax.hessian`` (vmapped);
- the eigenvector line searches building the bounding boxes are
  ``lax.while_loop``s vmapped over problems x directions;
- the posterior indicator sums and the per-region importance sampling are
  vectorised over (regions x points) instead of the reference's nested
  Python loops (``posteriors.py:556-795``).
"""

from __future__ import annotations

import logging
import typing

import numpy as np

import jax
import jax.numpy as jnp

from ..compile.compiler import compile_program
from ..model.extensions import ModelPrior
from ..utils import get_sub_seed
from .base import ParameterInference, _ProgressBar
from .bo.utils import adam_minimize as _shared_adam_minimize
from .results import RomcSample
from .utils import compute_ess, flat_array_to_dict

logger = logging.getLogger(__name__)

__all__ = ["ROMC", "OptimisationProblem", "RomcOptimisationResult",
           "NDimBoundingBox", "RegionConstructor", "RomcPosterior",
           "line_search"]


# ---------------------------------------------------------------------------
# deterministic objectives
# ---------------------------------------------------------------------------

class DeterministicObjective:
    """The frozen-key deterministic distance ``d^2(theta; u_i)`` of the
    reference (``romc.py:562-592``), as a traceable JAX function."""

    def __init__(self, model, discrepancy_name, parameter_names):
        self.model = model
        self.discrepancy_name = discrepancy_name
        self.parameter_names = list(parameter_names)
        prog = compile_program(model, (discrepancy_name,),
                               override_names=tuple(parameter_names))
        self._fn = prog.traceable(batch_size=1)

    def __call__(self, theta, key):
        """theta (D,), key -> squared distance (scalar); traceable."""
        overrides = {name: theta[i][None]
                     for i, name in enumerate(self.parameter_names)}
        out = self._fn(key, jnp.uint32(0), overrides)[self.discrepancy_name]
        d = out.reshape(-1)[-1]
        return d.astype(jnp.float32) ** 2


# the shared bounded Adam descent: value_and_grad evaluates the primal
# once per step — the objectives here run the WHOLE compiled
# simulator+distance program, so a separate obj(x)/grad(x) pair would
# double the solve phase's FLOPs
_adam_minimize = _shared_adam_minimize


def line_search(f, th_star, vd, eps, K=10, eta=1., rep_lim=300):
    """Offset along ``vd`` where f first exceeds eps, with K halving
    refinements (reference ``romc.py:1971-2015``); traceable."""
    def refine(k, carry):
        th, offset, eta_k, hit_lim = carry

        def cond(c):
            th_c, _, rep = c
            return (f(th_c) < eps) & (rep <= rep_lim)

        def body(c):
            th_c, off_c, rep = c
            return th_c + eta_k * vd, off_c + eta_k, rep + 1

        th, offset, rep = jax.lax.while_loop(
            cond, body, (th, offset, jnp.int32(0)))
        th = th - eta_k * vd
        offset = offset - eta_k
        hit_lim = hit_lim | (rep > rep_lim)
        return th, offset, eta_k / 2, hit_lim

    def outer(k, carry):
        th, offset, eta_k, hit = carry
        return jax.lax.cond(hit, lambda c: c, lambda c: refine(k, c),
                            (th, offset, eta_k, hit))

    th0 = jnp.asarray(th_star, jnp.float32)
    _, offset, eta_fin, _ = jax.lax.fori_loop(
        0, K, outer, (th0, jnp.float32(0.0), jnp.float32(eta),
                      jnp.bool_(False)))
    return jnp.where(offset <= 0, eta_fin, offset)


# ---------------------------------------------------------------------------
# regions
# ---------------------------------------------------------------------------

class NDimBoundingBox:
    """Eigenvector-aligned bounding box around an optimum (reference
    ``romc.py:1655-1849``)."""

    def __init__(self, rotation, center, limits):
        rotation = np.atleast_2d(np.asarray(rotation, float))
        center = np.atleast_1d(np.asarray(center, float))
        limits = np.asarray(limits, float).reshape(-1, 2)
        assert center.shape[0] == rotation.shape[0] == rotation.shape[1]
        self.dim = rotation.shape[0]
        self.rotation = rotation
        self.center = center
        self.limits = self._secure_limits(limits)
        self.rotation_inv = np.linalg.inv(self.rotation)
        self.volume = float(np.prod(self.limits[:, 1] - self.limits[:, 0]))

    @staticmethod
    def _secure_limits(limits):
        limits = limits.astype(float)
        eps = .001
        for i in range(limits.shape[0]):
            limits[i, 0] = min(limits[i, 0], 0.0)
            limits[i, 1] = max(limits[i, 1], 0.0)
            if np.isclose(limits[i, 0], limits[i, 1], atol=eps):
                limits[i, 0] -= eps / 2
                limits[i, 1] += eps / 2
        return limits

    def contains(self, point):
        v = self.rotation_inv @ (np.asarray(point) - self.center)
        return bool(np.all((v >= self.limits[:, 0])
                           & (v <= self.limits[:, 1])))

    def sample(self, n2, seed=None, key=None):
        if key is None:
            key = jax.random.key(seed if seed is not None
                                 else np.random.randint(2**31))
        lo = jnp.asarray(self.limits[:, 0])
        hi = jnp.asarray(self.limits[:, 1])
        u = jax.random.uniform(key, (n2, self.dim))
        box = lo + u * (hi - lo)
        return np.asarray(box @ jnp.asarray(self.rotation).T
                          + jnp.asarray(self.center))

    def pdf(self, theta):
        return self.contains(theta) / self.volume

    def plot(self, samples):
        import matplotlib.pyplot as plt
        plt.figure()
        samples = np.atleast_2d(samples)
        if self.dim == 1:
            plt.plot(samples[:, 0], np.zeros(len(samples)), "bo")
        else:
            plt.plot(samples[:, 0], samples[:, 1], "bo")
        plt.plot(*np.atleast_1d(self.center)[:2], "ro")


class RegionConstructor:
    """Builds the bounding box via eigenvector line searches (reference
    ``romc.py:1851-1968``)."""

    def __init__(self, result, func, dim, eps_region, K=10, eta=1.,
                 rep_lim=300):
        self.res = result
        self.func = func
        self.dim = dim
        self.eps_region = eps_region
        self.K = K
        self.eta = eta
        self.rep_lim = rep_lim

    @staticmethod
    def _find_rotation(hess_appr):
        dim = hess_appr.shape[0]
        if not np.all(np.isfinite(hess_appr)) or \
                np.linalg.matrix_rank(hess_appr) != dim:
            return np.eye(dim)
        eig_val, eig_vec = np.linalg.eigh((hess_appr + hess_appr.T) / 2)
        if not np.all(np.isfinite(eig_vec)) or \
                np.linalg.matrix_rank(eig_vec) < dim:
            return np.eye(dim)
        return eig_vec

    def build(self):
        theta0 = np.asarray(self.res.x_min, float)
        rotation = self._find_rotation(np.asarray(self.res.hess_appr))
        f = self.func
        limits = np.zeros((self.dim, 2))
        for d in range(self.dim):
            vd = jnp.asarray(rotation[:, d], jnp.float32)
            neg = line_search(f, theta0, -vd, self.eps_region, self.K,
                              self.eta, self.rep_lim)
            pos = line_search(f, theta0, vd, self.eps_region, self.K,
                              self.eta, self.rep_lim)
            limits[d] = [-float(neg), float(pos)]
        return [NDimBoundingBox(rotation, theta0, limits)]


# ---------------------------------------------------------------------------
# per-problem container (API parity with the reference OptimisationProblem)
# ---------------------------------------------------------------------------

class RomcOptimisationResult:
    def __init__(self, x_min, f_min, hess_appr, jac=None, hess=None,
                 hess_inv=None):
        self.x_min = np.atleast_1d(np.asarray(x_min, float))
        self.f_min = float(f_min)
        self.hess_appr = np.asarray(hess_appr, float)
        self.jac = jac
        self.hess = hess
        self.hess_inv = hess_inv


class OptimisationProblem:
    """One deterministic optimisation problem (reference
    ``romc.py:1326-1631``)."""

    def __init__(self, ind, nuisance, parameter_names, target_name,
                 objective, dim, prior, n1, bounds):
        self.ind = ind
        self.nuisance = nuisance          # integer seed (API parity)
        self.key = jax.random.key(int(nuisance))
        self.objective = objective        # host callable theta -> float
        self.dim = dim
        self.bounds = bounds
        self.parameter_names = parameter_names
        self.target_name = target_name
        self.prior = prior
        self.n1 = n1
        self.state = {"attempted": False, "solved": False,
                      "has_fit_surrogate": False,
                      "has_fit_local_surrogates": False,
                      "has_built_region_with_surrogate": False,
                      "region": False}
        self.bo_process = None
        self.surrogate = None
        self.local_surrogates = None
        self.result = None
        self.regions = None
        self.eps_region = None
        self.initial_point = None
        # traceable objective set by ROMC for device paths
        self._traceable = None

    def set_solution(self, x_min, f_min, hess_appr, x0=None):
        self.result = RomcOptimisationResult(x_min, f_min, hess_appr)
        self.initial_point = x0
        self.state["attempted"] = True
        self.state["solved"] = bool(np.isfinite(f_min))
        return self.state["solved"]

    def solve_gradients(self, **kwargs):
        """Solve this problem alone with jitted Adam (the batched path in
        ROMC._solve_gradients is preferred)."""
        seed = kwargs.get("seed") or 0
        x0 = kwargs.get("x0")
        if x0 is None:
            x0 = np.asarray(self.prior.rvs(size=self.n1,
                                           seed=seed))[self.ind]
        steps = kwargs.get("steps", 300)
        lr = kwargs.get("lr", 0.1)
        obj = self._traceable
        lo, hi = _bounds_arrays(self.bounds, self.dim)
        x, f = jax.jit(lambda x0_: _adam_minimize(
            lambda t: obj(t, self.key), x0_, steps, lr, lo, hi))(
                jnp.asarray(x0, jnp.float32))
        hess = jax.hessian(lambda t: obj(t, self.key))(x)
        return self.set_solution(np.asarray(x), float(f), np.asarray(hess),
                                 x0)

    def solve_bo(self, **kwargs):
        """Solve with deterministic Bayesian optimisation (reference
        ``romc.py:1446-1500``)."""
        from .bo.acquisition import LCBSC
        from .bo.gp import GPRegression

        n_evidence = kwargs.get("n_evidence", 20)
        acq_noise_var = kwargs.get("acq_noise_var", 0.1)
        seed = kwargs.get("seed") or 0
        bounds = self.bounds if self.bounds is not None else \
            [(0, 1)] * self.dim
        gp = GPRegression(self.parameter_names, bounds=list(bounds))
        acq = LCBSC(gp, prior=self.prior, noise_var=acq_noise_var,
                    seed=int(seed) + self.ind)
        n_init = max(5, n_evidence // 3)
        x_init = np.asarray(self.prior.rvs(
            size=n_init, seed=int(seed) + 7919 * (self.ind + 1)))
        x_init = np.clip(x_init, [b[0] for b in bounds],
                         [b[1] for b in bounds])
        y_init = np.array([self.objective(x) for x in x_init])
        gp.update(x_init, y_init, optimize=True)
        for t in range(n_evidence - n_init):
            x_new = acq.acquire(1, t=t)
            y_new = np.array([self.objective(x) for x in x_new])
            gp.update(x_new, y_new, optimize=(t % 5 == 4))

        pred = gp.device_predict(noiseless=True)
        self.surrogate = lambda theta: float(np.asarray(
            pred(jnp.atleast_2d(jnp.asarray(theta, jnp.float32)))[0])[0])
        self._surrogate_traceable = lambda theta: pred(theta[None])[0][0]
        self.bo_process = gp
        from .bo.utils import stochastic_optimization
        x_min, _ = stochastic_optimization(gp.predict_mean, gp.bounds,
                                           seed=int(seed))
        hess = jax.hessian(lambda t: self._traceable(t, self.key))(
            jnp.asarray(x_min, jnp.float32))
        solved = self.set_solution(x_min, self.objective(x_min),
                                   np.asarray(hess))
        self.state["has_fit_surrogate"] = True
        return solved

    def build_region(self, **kwargs):
        """Bounding box via line search (reference ``romc.py:1502-1548``)."""
        assert self.state["solved"]
        use_surrogate = kwargs.get("use_surrogate",
                                   self.state["has_fit_surrogate"])
        if use_surrogate:
            assert self.surrogate is not None
            func = self._surrogate_traceable
            self.state["has_built_region_with_surrogate"] = True
        else:
            func = lambda t: self._traceable(t, self.key)  # noqa: E731
        eps_region = kwargs["eps_region"]
        self.eps_region = eps_region
        constructor = RegionConstructor(
            self.result, func, self.dim, eps_region=eps_region,
            K=kwargs.get("K", 10), eta=kwargs.get("eta", 1.),
            rep_lim=kwargs.get("rep_lim", 300))
        self.regions = constructor.build()
        self.state["region"] = True
        return True

    def fit_local_surrogate(self, **kwargs):
        """Quadratic least-squares fit inside each region (reference
        ``romc.py:1550-1595``), via jnp.linalg.lstsq."""
        nof_samples = kwargs.get("nof_samples", 20)
        use_surrogate = kwargs.get("use_surrogate", False)
        if use_surrogate and self.surrogate is not None:
            objective_t = self._surrogate_traceable
        else:
            objective_t = lambda t: self._traceable(t, self.key)  # noqa: E731
        local = []
        self._local_coeffs = []
        for i, region in enumerate(self.regions):
            x = jnp.asarray(region.sample(
                nof_samples, key=jax.random.fold_in(self.key, 1000 + i)),
                jnp.float32)
            y = jax.vmap(objective_t)(x)
            feats = _quad_features(x)
            coef, *_ = jnp.linalg.lstsq(feats, y)
            self._local_coeffs.append(np.asarray(coef))
            local.append(_make_local_surrogate(np.asarray(coef)))
        self.local_surrogates = local
        self.state["has_fit_local_surrogates"] = True
        self.state["local_surrogates"] = True

    def visualize_region(self, force_objective=False, samples=None,
                         savefig=None):
        import matplotlib.pyplot as plt
        if not self.state["region"]:
            logger.warning("Problem %d has no region", self.ind)
            return
        region = self.regions[0]
        func = self.objective if (force_objective or self.surrogate is None) \
            else self.surrogate
        if self.dim == 1:
            xs = np.linspace(region.center[0] + region.limits[0, 0] - .2,
                             region.center[0] + region.limits[0, 1] + .2, 30)
            ys = [func(np.atleast_1d(x)) for x in xs]
            plt.figure()
            plt.plot(xs, ys, "r--")
            plt.axvspan(region.center[0] + region.limits[0, 0],
                        region.center[0] + region.limits[0, 1], alpha=.3)
            plt.axhline(self.eps_region, color="g")
        else:
            region.plot(samples if samples is not None
                        else region.sample(50, seed=0))
        if savefig:
            plt.savefig(savefig, bbox_inches="tight")


def _quad_features(x):
    """[1, x_i, x_i x_j (i<=j)] feature matrix for quadratic fits."""
    n, d = x.shape
    cols = [jnp.ones((n, 1)), x]
    for i in range(d):
        for j in range(i, d):
            cols.append((x[:, i] * x[:, j])[:, None])
    return jnp.concatenate(cols, axis=1)


def _make_local_surrogate(coef):
    def fn(theta):
        theta = np.atleast_1d(np.asarray(theta, np.float32))
        feats = np.asarray(_quad_features(jnp.asarray(theta)[None]))[0]
        return float(feats @ coef)
    return fn


def _bounds_arrays(bounds, dim):
    if bounds is None:
        return (jnp.full((dim,), -jnp.inf), jnp.full((dim,), jnp.inf))
    b = np.asarray(bounds, float)
    return jnp.asarray(b[:, 0], jnp.float32), jnp.asarray(b[:, 1],
                                                          jnp.float32)


# ---------------------------------------------------------------------------
# posterior
# ---------------------------------------------------------------------------

class RomcPosterior:
    """ROMC posterior: prior x (sum of region indicators), with vectorised
    device evaluation (reference ``posteriors.py:393-795``)."""

    def __init__(self, regions, objectives, objectives_actual=None,
                 objectives_surrogate=None, objectives_local=None,
                 nuisance=None, surrogate_used=False, prior=None,
                 left_lim=None, right_lim=None, eps_filter=None,
                 eps_region=None, eps_cutoff=None, parallelize=False,
                 traceable_objective=None, keys=None, local_coeffs=None,
                 surrogate_fns=None, surrogate_aux=None, mesh=None):
        self.regions = regions
        self.funcs = objectives
        self.objectives_actual = objectives_actual
        self.objectives_surrogate = objectives_surrogate
        self.objectives_local = objectives_local
        self.nuisance = nuisance
        self.surrogate_used = surrogate_used
        self.prior = prior
        self.left_lim = left_lim
        self.right_lim = right_lim
        self.eps_filter = eps_filter
        self.eps_region = eps_region
        self.eps_cutoff = eps_cutoff
        self.dim = prior.dim if prior is not None else None
        self.partition = None
        # vectorised evaluation data
        self._tr_obj = traceable_objective
        self._keys = keys          # stacked frozen keys, one per region
        self._local_coeffs = None if local_coeffs is None else \
            jnp.asarray(np.stack(local_coeffs))
        #: per-region stacked GP factorisations (use_bo fits) — when set,
        #: the device paths evaluate the surrogates, like the reference's
        #: ``self.funcs`` (romc.py:507-551)
        self._surrogate_fns = surrogate_fns
        self._surrogate_aux = surrogate_aux
        #: device mesh of the active sharded client (None = single device);
        #: sample() lays the n2 draw axis over it
        self._mesh = mesh
        self._jit_cache = {}       # compiled count/sample programs

    def _surrogate_mu(self, theta, aux_one):
        """Surrogate objective value at theta under one region's GP."""
        Xp, mask, L, alpha, params = aux_one
        mu, _ = self._surrogate_fns.predict_noiseless(theta[None], Xp,
                                                      mask, L, alpha, params)
        return mu[0]

    # -- vectorised objective over regions ------------------------------------
    def _distances_traceable(self, theta):
        """theta (D,) -> distances under every region's objective (R,)."""
        if self._local_coeffs is not None:
            feats = _quad_features(theta[None])[0]
            return self._local_coeffs @ feats
        if self._surrogate_aux is not None:
            return jax.vmap(lambda aux: self._surrogate_mu(theta, aux))(
                self._surrogate_aux)
        return jax.vmap(lambda k: self._tr_obj(theta, k))(self._keys)

    def _indicator_counts(self, thetas):
        """(n, D) -> number of regions accepting each point."""
        count = self._jit_cache.get("count")
        if count is None:
            def count(ts, eps):
                def one(t):
                    d = self._distances_traceable(t)
                    return jnp.sum(d <= eps)
                return jax.vmap(one)(ts)

            count = self._jit_cache["count"] = jax.jit(count)
        return np.asarray(count(jnp.asarray(thetas, jnp.float32),
                                jnp.float32(self.eps_cutoff)))

    def _all_distances(self, thetas):
        """(n, D) -> (n, R) distances under every region objective, one
        compiled program (cached)."""
        fn = self._jit_cache.get("dists")
        if fn is None:
            fn = self._jit_cache["dists"] = jax.jit(
                jax.vmap(self._distances_traceable))
        return np.asarray(fn(jnp.asarray(thetas, jnp.float32)))

    # -- pdf -----------------------------------------------------------------------
    def pdf_unnorm_batched(self, theta):
        theta = np.atleast_2d(np.asarray(theta, np.float32))
        pr = np.asarray(self.prior.pdf(theta)).ravel()
        if self.surrogate_used:
            inside = np.array([[r.contains(t) for r in self.regions]
                               for t in theta])
            d = self._all_distances(theta)
            counts = np.sum(inside & (d <= self.eps_cutoff), axis=1)
        else:
            counts = self._indicator_counts(theta)
        return pr * counts

    def _approximate_partition(self, nof_points=30):
        assert self.dim <= 2, "partition approximation only for dim <= 2"
        grids = [np.linspace(self.left_lim[i], self.right_lim[i], nof_points)
                 for i in range(self.dim)]
        mesh = np.stack(np.meshgrid(*grids), -1).reshape(-1, self.dim)
        vol = np.prod((np.asarray(self.right_lim)
                       - np.asarray(self.left_lim)) / nof_points)
        self.partition = float(np.sum(self.pdf_unnorm_batched(mesh) * vol))
        return self.partition

    def pdf(self, theta):
        if self.partition is None:
            self._approximate_partition()
        return self.pdf_unnorm_batched(theta) / self.partition

    def reset_eps_cutoff(self, eps_cutoff):
        self.eps_cutoff = eps_cutoff
        self.partition = None

    # -- sampling --------------------------------------------------------------------
    def sample(self, n2, seed=None, key=None):
        """n2 importance samples per region, fully vectorised.

        Returns (thetas (R, n2, D), weights (R, n2), distances (R*n2,)).
        """
        if key is None:
            key = jax.random.key(seed if seed is not None
                                 else np.random.randint(2**31))
        R = len(self.regions)
        rot = jnp.asarray(np.stack([r.rotation for r in self.regions]),
                          jnp.float32)
        center = jnp.asarray(np.stack([r.center for r in self.regions]),
                             jnp.float32)
        lims = jnp.asarray(np.stack([r.limits for r in self.regions]),
                           jnp.float32)
        vols = jnp.asarray([r.volume for r in self.regions], jnp.float32)

        # ONE compiled program (cached on the posterior) draws the box
        # points and evaluates every region objective — eager vmaps here
        # would dispatch the whole simulator op-by-op over a ~30 ms
        # tunnel per primitive.  Under a sharded client the n2 draw axis
        # is laid over the mesh (regions R vary per run and are few; the
        # per-region draws are the wide, independent axis) so the region
        # objectives evaluate SPMD across ICI.
        mesh = self._mesh
        shard_n2 = mesh is not None and n2 % mesh.devices.size == 0
        draw = self._jit_cache.get(("sample", n2, R, shard_n2))
        if draw is None:
            def draw(key, rot, center, lims, keys):
                u = jax.random.uniform(key, (R, n2, self.dim))
                if shard_n2:
                    from jax.sharding import NamedSharding, PartitionSpec
                    u = jax.lax.with_sharding_constraint(
                        u, NamedSharding(
                            mesh, PartitionSpec(None, mesh.axis_names[0])))
                box = lims[:, None, :, 0] + u * (lims[:, None, :, 1]
                                                 - lims[:, None, :, 0])
                thetas = jnp.einsum("rij,rnj->rni", rot, box) \
                    + center[:, None, :]
                if self._local_coeffs is not None:
                    def dist_one(r_idx, t):
                        feats = _quad_features(t[None])[0]
                        return self._local_coeffs[r_idx] @ feats
                    dists = jax.vmap(lambda r_idx, ts: jax.vmap(
                        lambda t: dist_one(r_idx, t))(ts))(
                            jnp.arange(R), thetas)
                elif self._surrogate_aux is not None:
                    dists = jax.vmap(lambda aux, ts: jax.vmap(
                        lambda t: self._surrogate_mu(t, aux))(ts))(
                            self._surrogate_aux, thetas)
                else:
                    dists = jax.vmap(lambda k, ts: jax.vmap(
                        lambda t: self._tr_obj(t, k))(ts))(keys, thetas)
                return thetas, dists

            draw = self._jit_cache[("sample", n2, R, shard_n2)] = \
                jax.jit(draw)

        thetas, dists = draw(key, rot, center, lims, self._keys)

        eps = jnp.float32(self.eps_cutoff)
        flat = thetas.reshape(-1, self.dim)
        pr = jnp.asarray(self.prior.pdf(np.asarray(flat))).reshape(R, n2)
        ind = (dists < eps).astype(jnp.float32)
        w = ind * pr * vols[:, None]

        return (np.asarray(thetas), np.asarray(w),
                np.asarray(dists).flatten())

    def compute_expectation(self, h, theta, w):
        h_theta = h(theta)
        return np.sum(h_theta * w) / np.sum(w)


# ---------------------------------------------------------------------------
# the inference method
# ---------------------------------------------------------------------------

class ROMC(ParameterInference):
    """Robust Optimisation Monte Carlo (reference ``romc.py:424-1323``)."""

    def __init__(self, model, bounds=None, discrepancy_name=None,
                 output_names=None, custom_optim_class=None,
                 parallelize=False, **kwargs):
        model, discrepancy_name = self._resolve_model(model,
                                                      discrepancy_name)
        output_names = [discrepancy_name] + model.parameter_names + \
            (output_names or [])
        super().__init__(model, output_names, **kwargs)
        self.discrepancy_name = discrepancy_name
        self.model_prior = ModelPrior(self.model)
        self.dim = self.model_prior.dim
        if isinstance(bounds, dict):  # reference accepts a name-keyed dict
            bounds = [bounds[p] for p in self.model.parameter_names]
        self.bounds = bounds
        self.left_lim = np.array([b[0] for b in bounds], float) \
            if bounds is not None else None
        self.right_lim = np.array([b[1] for b in bounds], float) \
            if bounds is not None else None

        self.inference_state = {
            "_has_gen_nuisance": False, "_has_defined_problems": False,
            "_has_solved_problems": False,
            "_has_fitted_surrogate_model": False,
            "_has_filtered_solutions": False,
            "_has_fitted_local_models": False,
            "_has_estimated_regions": False,
            "_has_defined_posterior": False, "_has_drawn_samples": False,
            "attempted": None, "solved": None, "accepted": None,
            "computed_BB": None}
        self.inference_args = {"parallelize": parallelize}
        self.custom_optim_class = custom_optim_class
        self.optim_problems = None
        self.posterior = None
        self.samples = None
        self.weights = None
        self.distances = None
        self.result = None
        self._objective = DeterministicObjective(
            self.model, discrepancy_name, self.parameter_names)

    # -- objectives ---------------------------------------------------------------
    def _define_objectives(self, n1, seed=None):
        nuisance = np.random.RandomState(seed).randint(
            1, 2**31 - 1, size=n1)
        self.inference_state["_has_gen_nuisance"] = True
        self.inference_args["N1"] = n1
        self.inference_args["initial_seed"] = seed

        problems = []
        for ind, nu in enumerate(nuisance):
            host_obj = self._make_host_objective(int(nu))
            cls = self.custom_optim_class or OptimisationProblem
            prob = cls(ind=ind, nuisance=int(nu),
                       parameter_names=self.parameter_names,
                       target_name=self.discrepancy_name,
                       objective=host_obj, dim=self.dim,
                       prior=self.model_prior, n1=n1, bounds=self.bounds)
            prob._traceable = self._objective
            problems.append(prob)
        self.optim_problems = problems
        self.inference_state["_has_defined_problems"] = True

    def _make_host_objective(self, nuisance):
        key = jax.random.key(nuisance)
        obj = self._objective

        def host_obj(theta):
            return float(np.asarray(obj(jnp.asarray(theta, jnp.float32),
                                        key)))
        return host_obj

    # -- solving ------------------------------------------------------------------
    def solve_problems(self, n1, use_bo=False, optimizer_args=None,
                       seed=None):
        """Define and solve the n1 deterministic problems (reference
        ``romc.py:954-993``); the gradient path solves ALL problems in one
        vmapped device program."""
        optimizer_args = dict(optimizer_args or {})
        optimizer_args.setdefault("seed", seed)
        self._define_objectives(n1=n1, seed=seed)
        if use_bo:
            logger.info("Solving problems with Bayesian optimisation")
            self._solve_bo(**optimizer_args)
        else:
            logger.info("Solving problems with vmapped autodiff descent")
            self._solve_gradients(**optimizer_args)

    def _solve_gradients(self, **kwargs):
        n1 = self.inference_args["N1"]
        seed = kwargs.get("seed") or 0
        steps = kwargs.get("steps", 300)
        lr = kwargs.get("lr", 0.1)
        x0 = kwargs.get("x0")
        if x0 is None:
            x0 = np.asarray(self.model_prior.rvs(size=n1, seed=seed))
        x0 = jnp.asarray(np.atleast_2d(x0), jnp.float32)
        restarts = int(kwargs.get("restarts", 5))
        if restarts > 1:
            # extra prior-drawn starts per problem; all (n1 x restarts)
            # descents run in ONE vmapped program and the per-problem best
            # is kept — multi-start is what makes gradient solves robust on
            # multi-modal objectives (e.g. 4-d g-and-k)
            extra = np.asarray(self.model_prior.rvs(
                size=n1 * (restarts - 1),
                seed=int(get_sub_seed(seed, 0xA11)))).reshape(
                    n1, restarts - 1, self.dim)
            x0 = jnp.concatenate(
                [x0[:, None, :], jnp.asarray(extra, jnp.float32)], axis=1)
        else:
            x0 = x0[:, None, :]
        keys = jnp.stack([p.key for p in self.optim_problems])
        lo, hi = _bounds_arrays(self.bounds, self.dim)
        obj = self._objective

        # Under a sharded client, the n1 problem axis is laid out over the
        # mesh so the single vmapped program runs SPMD across ICI — the
        # TPU-native form of the reference's multiprocessing solve pool
        # (reference ``romc.py:592-613``).  jit propagates the input
        # sharding; problems are independent, so no collectives appear.
        mesh = getattr(self.client, "mesh", None)
        if mesh is not None and n1 % mesh.devices.size == 0:
            from jax.sharding import NamedSharding, PartitionSpec
            sharded = NamedSharding(mesh, PartitionSpec(mesh.axis_names[0]))
            keys = jax.device_put(keys, sharded)
            x0 = jax.device_put(x0, sharded)

        @jax.jit
        def solve_all(keys, x0s):
            def one(key, starts):
                xr, fr = jax.vmap(lambda s: _adam_minimize(
                    lambda t: obj(t, key), s, steps, lr, lo, hi))(starts)
                b = jnp.argmin(fr)
                x, f = xr[b], fr[b]
                h = jax.hessian(lambda t: obj(t, key))(x)
                return x, f, h
            return jax.vmap(one)(keys, x0s)

        xs, fs, hs = solve_all(keys, x0)
        x0 = x0[:, 0, :]
        xs, fs, hs = np.asarray(xs), np.asarray(fs), np.asarray(hs)
        solved, attempted = [], []
        for i, prob in enumerate(self.optim_problems):
            attempted.append(True)
            solved.append(prob.set_solution(xs[i], fs[i], hs[i],
                                            np.asarray(x0[i])))
        self.inference_state["solved"] = solved
        self.inference_state["attempted"] = attempted
        self.inference_state["_has_solved_problems"] = True

    def _solve_bo(self, **kwargs):
        pb = _ProgressBar()
        solved, attempted = [], []
        for i, prob in enumerate(self.optim_problems):
            pb.update(i + 1, len(self.optim_problems))
            attempted.append(True)
            solved.append(prob.solve_bo(**kwargs))
        pb.finish()
        self.inference_state["attempted"] = attempted
        self.inference_state["solved"] = solved
        self.inference_state["_has_solved_problems"] = True
        self.inference_state["_has_fitted_surrogate_model"] = True

    # -- regions -------------------------------------------------------------------
    def compute_eps(self, quantile):
        assert self.inference_state["_has_solved_problems"]
        dist = [p.result.f_min for p in self.optim_problems
                if p.state["solved"]]
        return float(np.quantile(dist, quantile))

    def _filter_solutions(self, eps_filter):
        solved = self.inference_state["solved"]
        accepted = [bool(s and p.result.f_min < eps_filter)
                    for s, p in zip(solved, self.optim_problems)]
        self.inference_args["eps_filter"] = eps_filter
        self.inference_state["accepted"] = accepted
        self.inference_state["_has_filtered_solutions"] = True

    def estimate_regions(self, eps_filter, use_surrogate=None,
                         region_args=None, fit_models=False,
                         fit_models_args=None, eps_region=None,
                         eps_cutoff=None):
        """Filter + build bounding boxes (+ local models) (reference
        ``romc.py:994-1059``)."""
        assert self.inference_state["_has_solved_problems"], \
            "Solve the optimisation problems first"
        region_args = dict(region_args or {})
        fit_models_args = dict(fit_models_args or {})
        eps_cutoff = eps_cutoff if eps_cutoff is not None else eps_filter
        eps_region = eps_region if eps_region is not None else eps_filter
        if use_surrogate is None:
            use_surrogate = self.inference_state[
                "_has_fitted_surrogate_model"]
        region_args.setdefault("use_surrogate", use_surrogate)
        region_args.setdefault("eps_region", eps_region)
        self.inference_args["eps_region"] = eps_region
        self.inference_args["eps_cutoff"] = eps_cutoff

        self._filter_solutions(eps_filter)
        accepted = self.inference_state["accepted"]
        if self._can_batch_regions(accepted, region_args["use_surrogate"]):
            # ALL line searches (accepted problems x dims x 2 directions)
            # run as ONE jitted vmapped program — the per-problem loop
            # costs up to n_acc*dim*2 sequential while_loop dispatches on
            # a ~30 ms-latency remote chip (reference romc.py:1851-2015)
            self._build_regions_batched(accepted, **region_args)
            computed_bb = [bool(a) for a in accepted]
        else:
            computed_bb = []
            for i, prob in enumerate(self.optim_problems):
                if accepted[i]:
                    computed_bb.append(prob.build_region(**region_args))
                else:
                    computed_bb.append(False)
        self.inference_state["computed_BB"] = computed_bb
        self.inference_state["_has_estimated_regions"] = True

        if fit_models:
            fit_surr = fit_models_args.get("use_surrogate", False)
            if self._can_batch_regions(accepted, fit_surr):
                # same shape of problem the batched regions fixed: up to
                # n_accepted sequential lstsq fits on a ~30 ms-latency
                # remote chip become ONE vmapped program
                self._fit_local_surrogates_batched(accepted,
                                                   **fit_models_args)
            else:
                for i, prob in enumerate(self.optim_problems):
                    if accepted[i]:
                        prob.fit_local_surrogate(**fit_models_args)
            self.inference_state["_has_fitted_local_models"] = True

        self._define_posterior(eps_cutoff=eps_cutoff)

    def _can_batch_regions(self, accepted, use_surrogate):
        """Batched construction covers the default problem class with
        either the shared traceable objective or same-shape GP surrogates;
        custom optimisation classes keep the per-problem path."""
        if self.custom_optim_class is not None:
            return False
        probs = [p for p, a in zip(self.optim_problems, accepted) if a]
        if not probs:
            return False
        if use_surrogate:
            if any(p.bo_process is None for p in probs):
                return False
            fns0 = probs[0].bo_process.fns
            cap0 = probs[0].bo_process._factor[0].shape
            return all(p.bo_process.fns is fns0
                       and p.bo_process._factor[0].shape == cap0
                       for p in probs)
        return all(p._traceable is self._objective for p in probs)

    def _build_regions_batched(self, accepted, eps_region, use_surrogate,
                               K=10, eta=1., rep_lim=300, **_ignored):
        # **_ignored: the sequential path (build_region) reads known keys
        # via kwargs.get and tolerates extras — the batched fast path must
        # accept the same region_args dicts, not TypeError on them
        """One jitted program: line searches vmapped over
        (accepted problems) x (2 * dim eigenvector directions)."""
        probs = [p for p, a in zip(self.optim_problems, accepted) if a]
        D = self.dim
        theta0 = np.stack([np.asarray(p.result.x_min, np.float32)
                           for p in probs])
        rotations = np.stack([
            RegionConstructor._find_rotation(np.asarray(p.result.hess_appr))
            for p in probs]).astype(np.float32)
        # per problem: rows d<D are -eigvec_d, rows d>=D are +eigvec_d
        rot_t = np.transpose(rotations, (0, 2, 1))
        dirs = np.concatenate([-rot_t, rot_t], axis=1)      # (n, 2D, D)

        if use_surrogate:
            fns = probs[0].bo_process.fns
            aux = jax.tree_util.tree_map(
                lambda *xs: jnp.stack([jnp.asarray(x) for x in xs]),
                *[p.bo_process._factor for p in probs])

            def f_of(theta, aux_one):
                Xp, mask, L, alpha, params = aux_one
                mu, _ = fns.predict_noiseless(theta[None], Xp, mask, L,
                                              alpha, params)
                return mu[0]

            closed_over = fns
            cache_key = ("surrogate", K, eta, rep_lim)
        else:
            obj = self._objective
            aux = jnp.stack([p.key for p in probs])

            def f_of(theta, key):
                return obj(theta, key)

            closed_over = obj
            cache_key = ("objective", K, eta, rep_lim)

        # the jitted search CLOSES OVER fns/obj, so the cache entry guards
        # the captured object's identity (id()-keyed caching is unsafe:
        # a GC'd object's id can be reused by a different kernel bundle)
        cache = self.__dict__.setdefault("_region_search_cache", {})
        cached = cache.get(cache_key)
        if cached is not None and cached[0] is closed_over:
            search = cached[1]
        else:
            def per_problem(th0, ds, aux_one, eps):
                return jax.vmap(lambda vd: line_search(
                    lambda t: f_of(t, aux_one), th0, vd, eps, K, eta,
                    rep_lim))(ds)

            search = jax.jit(jax.vmap(per_problem,
                                      in_axes=(0, 0, 0, None)))
            cache[cache_key] = (closed_over, search)

        offsets = np.asarray(search(jnp.asarray(theta0), jnp.asarray(dirs),
                                    aux, jnp.float32(eps_region)))
        for i, prob in enumerate(probs):
            limits = np.stack([-offsets[i, :D], offsets[i, D:]], axis=1)
            prob.regions = [NDimBoundingBox(rotations[i], theta0[i],
                                            limits)]
            prob.eps_region = float(eps_region)
            prob.state["region"] = True
            if use_surrogate:
                prob.state["has_built_region_with_surrogate"] = True

    def _fit_local_surrogates_batched(self, accepted, nof_samples=20,
                                      use_surrogate=False, **_ignored):
        """All accepted problems' quadratic local-surrogate fits as ONE
        jitted vmapped program (each fit: sample the region box, evaluate
        the objective/GP surrogate, quadratic least squares — reference
        ``romc.py:1550-1595``). Matches OptimProblem.fit_local_surrogate
        exactly: same per-region fold_in key schedule, same float32 box
        sampling, same feature/lstsq formulation."""
        probs = [p for p, a in zip(self.optim_problems, accepted) if a]
        pairs = [(p, i, r) for p in probs for i, r in enumerate(p.regions)]
        if not pairs:
            return
        D = self.dim
        lo = np.stack([r.limits[:, 0] for _, _, r in pairs])
        hi = np.stack([r.limits[:, 1] for _, _, r in pairs])
        rot = np.stack([r.rotation for _, _, r in pairs])
        center = np.stack([r.center for _, _, r in pairs])
        keys = jnp.stack([jax.random.fold_in(p.key, 1000 + i)
                          for p, i, _ in pairs])
        use_surr = use_surrogate and all(p.surrogate is not None
                                         for p in probs)
        if use_surr:
            fns = probs[0].bo_process.fns
            aux = jax.tree_util.tree_map(
                lambda *xs: jnp.stack([jnp.asarray(x) for x in xs]),
                *[p.bo_process._factor for p, _, _ in pairs])

            def f_of(theta, aux_one):
                Xp, mask, L, alpha, params = aux_one
                mu, _ = fns.predict_noiseless(theta[None], Xp, mask, L,
                                              alpha, params)
                return mu[0]

            closed_over = fns
            cache_key = ("fit_surrogate", nof_samples)
        else:
            obj = self._objective
            aux = jnp.stack([p.key for p, _, _ in pairs])

            def f_of(theta, key):
                return obj(theta, key)

            closed_over = obj
            cache_key = ("fit_objective", nof_samples)

        # identity-guarded cache, same scheme as _build_regions_batched
        cache = self.__dict__.setdefault("_local_fit_cache", {})
        cached = cache.get(cache_key)
        if cached is not None and cached[0] is closed_over:
            fit = cached[1]
        else:
            def fit_one(lo1, hi1, rot1, c1, kdraw, aux_one):
                u = jax.random.uniform(kdraw, (nof_samples, D))
                box = lo1 + u * (hi1 - lo1)
                x = box @ rot1.T + c1
                y = jax.vmap(lambda t: f_of(t, aux_one))(x)
                feats = _quad_features(x)
                coef, *_ = jnp.linalg.lstsq(feats, y)
                return coef

            fit = jax.jit(jax.vmap(fit_one, in_axes=(0, 0, 0, 0, 0, 0)))
            cache[cache_key] = (closed_over, fit)

        coefs = np.asarray(fit(
            jnp.asarray(lo, jnp.float32), jnp.asarray(hi, jnp.float32),
            jnp.asarray(rot, jnp.float32),
            jnp.asarray(center, jnp.float32), keys, aux))
        per_prob = {}
        for (p, _, _), coef in zip(pairs, coefs):
            per_prob.setdefault(id(p), (p, []))[1].append(np.asarray(coef))
        for p, cs in per_prob.values():
            p._local_coeffs = cs
            p.local_surrogates = [_make_local_surrogate(c) for c in cs]
            p.state["has_fit_local_surrogates"] = True
            p.state["local_surrogates"] = True

    def _define_posterior(self, eps_cutoff):
        use_surrogate = self.inference_state["_has_fitted_surrogate_model"]
        use_local = self.inference_state["_has_fitted_local_models"]
        regions, objectives, actual, nuisance, keys, coeffs = \
            [], [], [], [], [], []
        region_probs = []
        for prob in self.optim_problems:
            if prob.state["region"]:
                for jj, region in enumerate(prob.regions):
                    nuisance.append(prob.nuisance)
                    keys.append(prob.key)
                    regions.append(region)
                    region_probs.append(prob)
                    actual.append(prob.objective)
                    if use_local:
                        objectives.append(prob.local_surrogates[jj])
                        coeffs.append(prob._local_coeffs[jj])
                    elif use_surrogate:
                        objectives.append(prob.surrogate)
                    else:
                        objectives.append(prob.objective)
        # device-path surrogate evaluation: stack every region's GP
        # factorisation (one entry per region, same order as `keys`) so
        # the posterior's vectorised pdf/sample programs evaluate the
        # fitted surrogates — matching the reference, which evaluates
        # ``self.funcs`` (the surrogates under use_bo, romc.py:507-551) —
        # instead of silently falling back to full simulator runs
        surrogate_fns = surrogate_aux = None
        if use_surrogate and not use_local and region_probs:
            gps = [p.bo_process for p in region_probs]
            if (all(g is not None and g._factor is not None for g in gps)
                    and all(g.fns is gps[0].fns for g in gps)
                    and len({g._factor[0].shape for g in gps}) == 1):
                surrogate_fns = gps[0].fns
                surrogate_aux = jax.tree_util.tree_map(
                    lambda *xs: jnp.stack([jnp.asarray(x) for x in xs]),
                    *[g._factor for g in gps])
        self.posterior = RomcPosterior(
            regions, objectives, actual, None, None, nuisance,
            use_local or use_surrogate, self.model_prior, self.left_lim,
            self.right_lim, self.inference_args["eps_filter"],
            self.inference_args["eps_region"], eps_cutoff,
            self.inference_args["parallelize"],
            traceable_objective=self._objective,
            keys=jnp.stack(keys) if keys else None,
            local_coeffs=coeffs if use_local else None,
            surrogate_fns=surrogate_fns, surrogate_aux=surrogate_aux,
            mesh=getattr(self.client, "mesh", None))
        self.inference_state["_has_defined_posterior"] = True

    # -- one-call training ------------------------------------------------------------
    def fit_posterior(self, n1, eps_filter, use_bo=False, quantile=None,
                      optimizer_args=None, region_args=None,
                      fit_models=False, fit_models_args=None, seed=None,
                      eps_region=None, eps_cutoff=None):
        """solve + filter + regions in one call (reference
        ``romc.py:898-952``)."""
        self.solve_problems(n1=n1, use_bo=use_bo,
                            optimizer_args=optimizer_args, seed=seed)
        if eps_filter == "auto":
            eps_filter = self.compute_eps(float(quantile))
        self.estimate_regions(eps_filter=float(eps_filter),
                              use_surrogate=use_bo, region_args=region_args,
                              fit_models=fit_models,
                              fit_models_args=fit_models_args,
                              eps_region=eps_region, eps_cutoff=eps_cutoff)

    # -- inference ---------------------------------------------------------------------
    def sample(self, n2, seed=None):
        assert self.inference_state["_has_defined_posterior"], \
            "You must train first"
        self.samples, self.weights, self.distances = \
            self.posterior.sample(n2, seed=seed)
        self.inference_state["_has_drawn_samples"] = True
        self.result = self.extract_result()
        return self.result

    def eval_unnorm_posterior(self, theta):
        assert self.inference_state["_has_defined_posterior"]
        return self.posterior.pdf_unnorm_batched(np.atleast_2d(theta))

    def eval_posterior(self, theta):
        assert self.inference_state["_has_defined_posterior"]
        assert self.bounds is not None, \
            "bounds are needed to approximate the partition function"
        return self.posterior.pdf(np.atleast_2d(theta))

    def compute_expectation(self, h):
        assert self.inference_state["_has_drawn_samples"]
        return self.posterior.compute_expectation(h, self.samples,
                                                  self.weights)

    def compute_ess(self):
        assert self.inference_state["_has_drawn_samples"]
        return compute_ess(self.result.weights)

    def compute_divergence(self, gt_posterior, bounds=None, step=0.1,
                           distance="Jensen-Shannon"):
        """Grid divergence to a ground-truth posterior (reference
        ``romc.py:1169-1242``)."""
        import scipy.stats as ss
        from scipy import spatial
        assert self.inference_state["_has_defined_posterior"]
        assert distance in ("Jensen-Shannon", "KL-Divergence")
        limits = bounds or self.bounds
        dim = len(limits)
        if dim > 2:
            logger.info("divergence approximation intractable for dim > 2")
            return None
        grids = [np.linspace(b[0], b[1], int((b[1] - b[0]) / step))
                 for b in limits]
        mesh = np.stack(np.meshgrid(*grids), -1).reshape(-1, dim)
        p_points = np.squeeze(self.eval_posterior(mesh))
        q_points = np.squeeze(gt_posterior(mesh))
        if distance == "KL-Divergence":
            return ss.entropy(p_points, q_points)
        return spatial.distance.jensenshannon(p_points, q_points)

    def extract_result(self):
        if self.samples is None:
            raise ValueError("Nothing to extract")
        outputs = {}
        for i, name in enumerate(self.model.parameter_names):
            outputs[name] = self.samples[:, :, i].flatten()
        outputs[self.discrepancy_name] = self.distances.flatten()
        return RomcSample(method_name="ROMC", outputs=outputs,
                          parameter_names=self.model.parameter_names,
                          discrepancy_name=self.discrepancy_name,
                          weights=self.weights.flatten())

    # -- inspection -----------------------------------------------------------------------
    def visualize_region(self, i, force_objective=False, savefig=False):
        samples = None
        if self.samples is not None:
            k = sum(1 for j in range(i)
                    if self.optim_problems[j].state["region"])
            samples = self.samples[k]
        self.optim_problems[i].visualize_region(force_objective, samples,
                                                savefig)

    def distance_hist(self, savefig=False, **kwargs):
        import matplotlib.pyplot as plt
        assert self.inference_state["_has_solved_problems"]
        dist = [max(p.result.f_min, 0) for p in self.optim_problems
                if p.state["solved"]]
        plt.figure()
        plt.hist(dist, **kwargs)
        if savefig:
            plt.savefig(savefig, bbox_inches="tight")
