"""Smoke tests: rejection ABC runs on every zoo model
(reference ``tests/functional/test_examples.py``)."""

import os
import shutil
import subprocess

import numpy as np
import pytest

import elfi_tpu as elfi


def smoke_rejection(m, discrepancy="d", batch_size=16, n=4):
    rej = elfi.Rejection(m[discrepancy], batch_size=batch_size, seed=2)
    res = rej.sample(n, quantile=0.5, bar=False)
    assert res.n_samples == n
    assert np.all(np.isfinite(res.samples_array))
    return res


def test_ma2():
    from elfi_tpu.models import ma2
    smoke_rejection(ma2.get_model(seed_obs=3))


def test_gauss():
    from elfi_tpu.models import gauss
    smoke_rejection(gauss.get_model(seed_obs=3))


def test_gauss_nd_mean():
    from elfi_tpu.models import gauss
    cov = [[0.5, 0.2], [0.2, 1.0]]
    smoke_rejection(gauss.get_model(seed_obs=3, nd_mean=True,
                                    cov_matrix=cov))


def test_ricker():
    from elfi_tpu.models import ricker
    smoke_rejection(ricker.get_model(seed_obs=3))


def test_ricker_deterministic():
    from elfi_tpu.models import ricker
    smoke_rejection(ricker.get_model(seed_obs=3, stochastic=False))


def test_gnk():
    from elfi_tpu.models import gnk
    smoke_rejection(gnk.get_model(seed_obs=3))


def test_bignk():
    from elfi_tpu.models import bignk
    smoke_rejection(bignk.get_model(seed_obs=3))


def test_ar1():
    from elfi_tpu.models import ar1
    smoke_rejection(ar1.get_model(seed_obs=3))


def test_arch():
    from elfi_tpu.models import arch
    smoke_rejection(arch.get_model(seed_obs=3))


def test_mg1():
    from elfi_tpu.models import mg1
    smoke_rejection(mg1.get_model(seed_obs=3))


def test_lorenz():
    from elfi_tpu.models import lorenz
    smoke_rejection(lorenz.get_model(seed_obs=3, n_timestep=40), batch_size=8)


def test_lotka_volterra():
    from elfi_tpu.models import lotka_volterra
    m = lotka_volterra.get_model(n_obs=8, seed_obs=3, time_end=5.)
    smoke_rejection(m, batch_size=8)


def test_toad():
    from elfi_tpu.models import toad
    m = toad.get_model(seed_obs=3, n_toads=10, n_days=20)
    smoke_rejection(m, batch_size=8)


def test_stochastic_volatility():
    from elfi_tpu.models import stochastic_volatility
    smoke_rejection(stochastic_volatility.get_model(seed_obs=3))


def test_daycare():
    from elfi_tpu.models import daycare
    m = daycare.get_model(seed_obs=3, n_dcc=2, n_ind=8, n_strains=4,
                          n_obs=6, time_end=0.5)
    smoke_rejection(m, batch_size=4)


def test_scratch_assay():
    from elfi_tpu.models import scratch_assay
    m = scratch_assay.get_model(seed_obs=3, init_params=[8, 8, 10, 3],
                                obs_period=2, obs_interval=1, tau=1 / 2)
    smoke_rejection(m, batch_size=4)


def test_bdm(tmp_path):
    from elfi_tpu.models import bdm
    if shutil.which("g++") is None:
        pytest.skip("g++ not available")
    cwd = os.getcwd()
    try:
        os.chdir(tmp_path)
        exe = bdm.ensure_executable(str(tmp_path))
        if exe is None:
            pytest.skip("could not compile bdm")
        import warnings
        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            m = bdm.get_model()
        smoke_rejection(m, batch_size=16)
    finally:
        os.chdir(cwd)
