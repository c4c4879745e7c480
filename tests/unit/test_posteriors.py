"""BolfiPosterior sampler-target stability: fit data must flow through
target_args so one compiled NUTS program serves every fit (the pre-round-4
design closed over the GP factorisation and paid a full remote XLA compile
per BOLFI.sample() call — 9-70 s measured over the TPU tunnel)."""

import numpy as np
import pytest

import jax.numpy as jnp

import elfi_tpu as elfi
from elfi_tpu.methods.bo.gp import GPRegression
from elfi_tpu.methods.posteriors import BolfiPosterior
from elfi_tpu.model.extensions import ModelPrior


def _box_model(name):
    m = elfi.Model(name=name)
    elfi.Prior("uniform", -2, 4, model=m, name="a")
    elfi.Prior("uniform", -1, 2, model=m, name="b")
    return m


def _fitted_gp(seed):
    rng = np.random.RandomState(seed)
    gp = GPRegression(["a", "b"], bounds=[(-2, 2), (-1, 1)])
    X = rng.uniform([-2, -1], [2, 1], size=(24, 2))
    y = np.sum(X ** 2, axis=1) + 0.05 * rng.randn(24)
    gp.update(X, y, optimize=True)
    return gp


@pytest.fixture(scope="module")
def posteriors():
    prior1 = ModelPrior(_box_model("post_m1"), parameter_names=["a", "b"])
    prior2 = ModelPrior(_box_model("post_m2"), parameter_names=["a", "b"])
    p1 = BolfiPosterior(_fitted_gp(0), prior=prior1, seed=0)
    p2 = BolfiPosterior(_fitted_gp(1), prior=prior2, seed=1)
    return p1, p2


def test_box_target_identity_stable_across_fits(posteriors):
    p1, p2 = posteriors
    fn1, args1 = p1.traceable_logpdf_args()
    fn2, args2 = p2.traceable_logpdf_args()
    assert fn1 is fn2          # one jit cache entry for every fit
    # ... while the data actually differs
    assert not np.array_equal(np.asarray(args1[0][1]),
                              np.asarray(args2[0][1]))


def test_args_target_matches_closure_logpdf(posteriors):
    p1, _ = posteriors
    fn, (data,) = p1.traceable_logpdf_args()
    closure = p1.traceable_logpdf()
    xs = np.array([[0.5, 0.2], [-1.5, 0.9], [2.5, 0.0]], np.float32)
    got = np.asarray([fn(jnp.asarray(x), data) for x in xs])
    want = np.asarray([closure(jnp.asarray(x)) for x in xs])
    np.testing.assert_allclose(got, want, rtol=1e-6)
    # host API agrees too (same math; batched program compiles its own
    # float32 arithmetic, so exactness is not expected)
    np.testing.assert_allclose(p1.logpdf(xs), want, rtol=1e-4)
    # outside the prior box -> -inf
    assert want[2] == -np.inf


def test_general_prior_falls_back_to_closure_target():
    m = elfi.Model(name="post_norm")
    elfi.Prior("norm", 0, 1, model=m, name="a")
    elfi.Prior("uniform", -1, 2, model=m, name="b")
    prior = ModelPrior(m, parameter_names=["a", "b"])
    assert prior.box() is None
    post = BolfiPosterior(_fitted_gp(2), prior=prior, seed=0)
    fn, (data,) = post.traceable_logpdf_args()
    # general-path data tuple carries no box
    assert len(data) == 6
    lp = post.logpdf(np.array([[0.0, 0.0], [0.0, 5.0]], np.float32))
    assert np.isfinite(lp[0])
    assert lp[1] == -np.inf


def test_bolfire_posterior_subtracts_gp_mean():
    """Sign regression (r05): the BOLFIRE surrogate is fit on the NEGATIVE
    log-ratio, so the log-posterior must SUBTRACT the GP mean (reference
    ``posteriors.py:326``).  The r04 code added it, which mirrored the
    posterior: on a bowl-shaped GP mean the logpdf must peak at the bowl's
    minimum, not at the box corners."""
    from elfi_tpu.methods.posteriors import BolfirePosterior

    # box prior -> exercises the _bolfire_box_target fast path
    prior = ModelPrior(_box_model("post_bfr1"), parameter_names=["a", "b"])
    post = BolfirePosterior(["a", "b"], _fitted_gp(3), prior)
    lp = post.logpdf(np.array([[0.0, 0.0], [1.8, 0.9]], np.float32))
    assert lp[0] > lp[1]
    # gradient points downhill on the GP mean (towards the bowl minimum)
    g = post.gradient_logpdf(np.array([1.0, 0.5], np.float32))
    assert g[0] < 0 and g[1] < 0

    # general (non-box) prior path must use the same sign convention
    m = elfi.Model(name="post_bfr2")
    elfi.Prior("norm", 0, 10, model=m, name="a")
    elfi.Prior("uniform", -1, 2, model=m, name="b")
    prior2 = ModelPrior(m, parameter_names=["a", "b"])
    post2 = BolfirePosterior(["a", "b"], _fitted_gp(3), prior2)
    lp2 = post2.logpdf(np.array([[0.0, 0.0], [1.8, 0.9]], np.float32))
    assert lp2[0] > lp2[1]
