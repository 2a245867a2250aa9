"""BASELINE.json config 4: custom jump proposals + prior-draw jumps with a
weighted jump cycle on a 50-D hierarchical Gaussian, with posterior-moment
assertions against the model's closed form."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from ptmcmcsampler_tpu import PTSampler
from ptmcmcsampler_tpu.models import HierarchicalGaussian


@pytest.fixture(scope="module")
def model():
    return HierarchicalGaussian()  # 50-D


def test_analytic_moments_selfcheck(model):
    """The closed-form posterior must satisfy its own score equations:
    sampling the exact posterior Gaussian reproduces the moments."""
    mean, cov = model.posterior_moments()
    assert mean.shape == (50,) and cov.shape == (50, 50)
    # posterior precision residual: prec @ mean == b
    g = model.ngroups
    prec = np.linalg.inv(cov)
    b = np.zeros(model.ndim)
    b[1:] = model.y / model.s_y**2
    np.testing.assert_allclose(prec @ mean, b, atol=1e-8)
    # data strongly informs theta: posterior theta mean near y
    assert np.all(np.abs(mean[1:] - model.y) < 1.0)


def test_prior_draw_jump_correctness_prior_only(model):
    """With a flat likelihood, a cycle containing the prior-draw jump must
    sample the prior itself (every proposal accepted: qxy cancels exactly)."""
    ndim = model.ndim
    s = PTSampler(
        ndim,
        lambda x: jnp.zeros(()),  # flat likelihood
        model.lnpriorfn,
        np.eye(ndim) * 0.1,
        ntemps=1, nchains=32, outDir="/tmp/hier_prior_only", verbose=False, seed=3,
    )
    s.addPriorDrawToCycle(model.draw_prior, 10)
    s.sample(np.zeros(ndim), 1500, burn=200, thin=1, isave=500, covUpdate=500,
             SCAMweight=0, AMweight=0, DEweight=0, NUTSweight=0, HMCweight=0,
             MALAweight=0)
    names = s.config.jump_names()
    assert "DrawFromPrior" in names
    idx = names.index("DrawFromPrior")
    ctr = jax.device_get(s.state.counters)
    prop = np.asarray(ctr.jump_proposed)[idx].sum()
    acc = np.asarray(ctr.jump_accepted)[idx].sum()
    assert prop > 0
    # Independence proposal from the exact target: acceptance ratio == 1.
    assert acc == prop
    # Prior marginals: mu ~ N(0, s_mu^2); pooled over chains and rows.
    samples = s.pooled_chain[32 * 300 :]
    mu = samples[:, 0]
    assert abs(mu.mean()) < 0.35
    np.testing.assert_allclose(mu.std(), model.s_mu, rtol=0.15)


@pytest.mark.slow
def test_config4_weighted_cycle_posterior_moments(model, tmp_path):
    """Full config-4 run: SCAM/AM/DE + a custom jump + the prior-draw jump,
    all weighted into one cycle; pooled posterior moments must match the
    analytic linear-Gaussian posterior."""
    ndim = model.ndim
    mean, cov = model.posterior_moments()
    sd = np.sqrt(np.diag(cov))

    def custom_gauss_jump(key, x, it, beta):
        # small isotropic Gaussian step (JAX-native custom jump protocol)
        return x + 0.05 * jax.random.normal(key, x.shape, x.dtype), jnp.zeros(())

    s = PTSampler(
        ndim, model.lnlikefn, model.lnpriorfn, np.eye(ndim) * 0.05,
        ntemps=2, nchains=64, outDir=str(tmp_path / "hier"), verbose=False,
        seed=11,
    )
    s.addProposalToCycle(custom_gauss_jump, 5, name="SmallGauss")
    s.addPriorDrawToCycle(model.draw_prior, 2)
    niter = 6000
    s.sample(np.zeros(ndim), niter, burn=1000, thin=2, isave=1000,
             covUpdate=500, SCAMweight=20, AMweight=20, DEweight=20,
             NUTSweight=0, HMCweight=0, MALAweight=0, Tskip=100)

    names = s.config.jump_names()
    assert "SmallGauss" in names and "DrawFromPrior" in names
    ctr = jax.device_get(s.state.counters)
    for jname in ("SmallGauss", "DrawFromPrior"):
        assert np.asarray(ctr.jump_proposed)[names.index(jname)].sum() > 0

    # Pooled posterior moments across all 64 cold chains, post burn.
    chains = s.chains  # [C, rows, D]
    post = chains[:, 1000 // 2 :, :].reshape(-1, ndim)
    err = np.abs(post.mean(axis=0) - mean) / sd
    assert np.all(err < 0.5), err.max()
    np.testing.assert_allclose(post.std(axis=0), sd, rtol=0.25)
