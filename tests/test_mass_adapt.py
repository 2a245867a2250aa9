"""Adaptive mass matrix (``mass_adapt`` / ``sample(massAdapt=True)``).

The reference's equivalent — ``GradientJump.update_cf`` (nutsjump.py:56-69) —
is dormant: every call site is commented out (:210-215, :261-265, :684-688)
and the jumps print "not yet adaptive" on init (:45). Here the capability is
wired and tested: at every ``covUpdate`` refresh the gradient jumps'
whitening Cholesky tracks the adapted sample covariance, so HMC/NUTS/ChEES
dynamics run in approximately isotropized coordinates.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ptmcmcsampler_tpu import PTSampler, diagnostics
from ptmcmcsampler_tpu.config import JumpSpec, SamplerConfig
from ptmcmcsampler_tpu.kernel import build_step
from ptmcmcsampler_tpu.state import init_state


def correlated_model(cov):
    icov = np.linalg.inv(cov)
    ndim = cov.shape[0]

    def logl(x):
        return -0.5 * x @ jnp.asarray(icov, jnp.float32) @ x

    def logp(x):
        return jnp.where(jnp.all(jnp.abs(x) < 50.0), 0.0, -jnp.inf)

    def func_grad(x, beta):
        g = -jnp.asarray(icov, jnp.float32) @ x
        return beta * logl(x), beta * g

    return logl, logp, func_grad


def run_sampler(jump_kind, cov_target, mass_adapt, niter, seed=0, nchains=64,
                **cfg_kw):
    ndim = cov_target.shape[0]
    logl, logp, func_grad = correlated_model(cov_target)
    cfg = SamplerConfig(
        ndim=ndim,
        ntemps=1,
        nchains=nchains,
        groups=(tuple(range(ndim)),),
        jumps=(JumpSpec(jump_kind, jump_kind, 10),),
        tskip=10**9,
        cov_update=100,
        burn=niter // 2,
        thin=1,
        de_size=100,
        mass_adapt=mass_adapt,
        **cfg_kw,
    )
    _, run_block = build_step(cfg, logl, logp, func_grad)
    # Start from scattered points so the empirical covariance is informative
    # even before much mixing has happened.
    rng = np.random.default_rng(seed)
    x0 = rng.multivariate_normal(np.zeros(ndim), cov_target, size=nchains)
    xs = jnp.asarray(x0[None], jnp.float32)
    ll0 = jax.vmap(jax.vmap(logl))(xs)
    lp0 = jax.vmap(jax.vmap(logp))(xs)
    state = init_state(
        cfg, jax.random.PRNGKey(seed), x0[None], np.eye(ndim), np.ones(1), ll0, lp0
    )
    state, _ = run_block(state, niter // 2)  # burn + adaptation
    state, out = run_block(state, niter // 2)
    return cfg, state, out


class TestWhiteningTracksCovariance:
    def test_chol_refreshes_to_adapted_cov(self):
        cov = np.array([[1.0, 0.9], [0.9, 1.0]])
        _, state, _ = run_sampler("am", cov, mass_adapt=True, niter=400)
        chol = np.asarray(state.adapt.chol, np.float64)
        chol_inv = np.asarray(state.adapt.chol_inv, np.float64)
        adapted_cov = np.asarray(state.adapt.cov, np.float64)
        # chol is the Cholesky of the *adapted* covariance...
        np.testing.assert_allclose(chol @ chol.T, adapted_cov, rtol=1e-3, atol=1e-4)
        # ...its inverse is consistent...
        np.testing.assert_allclose(chol_inv @ chol, np.eye(2), atol=1e-4)
        # ...and the adapted covariance actually learned the target's
        # correlation structure (so the whitening is doing real work).
        corr = adapted_cov[0, 1] / np.sqrt(adapted_cov[0, 0] * adapted_cov[1, 1])
        assert corr > 0.7, corr

    def test_frozen_without_flag(self):
        cov = np.array([[1.0, 0.9], [0.9, 1.0]])
        _, state, _ = run_sampler("am", cov, mass_adapt=False, niter=400)
        # Initial cov was the identity: without the flag the whitening factor
        # must still be the identity even though adapt.cov has moved.
        np.testing.assert_allclose(np.asarray(state.adapt.chol), np.eye(2), atol=1e-6)
        adapted_cov = np.asarray(state.adapt.cov)
        assert abs(adapted_cov[0, 1]) > 0.1  # cov itself did adapt


class TestMassAdaptESSGain:
    @pytest.mark.slow
    def test_hmc_ess_gain_on_ill_scaled_target(self):
        """Fixed-step HMC with an identity mass matrix on a badly scaled
        Gaussian (variances 100 vs 1) cannot traverse the wide direction
        within its trajectory budget; letting the whitening track the adapted
        covariance must recover a large ESS factor (measured ~40x here,
        asserted >5x for seed robustness)."""
        cov = np.array([[100.0, 0.0], [0.0, 1.0]])
        niter = 2000
        kw = dict(hmc_stepsize=0.3, hmc_nminsteps=2, hmc_nmaxsteps=12)
        _, _, out_frozen = run_sampler(
            "hmc", cov, mass_adapt=False, niter=niter, **kw
        )
        _, _, out_adapt = run_sampler(
            "hmc", cov, mass_adapt=True, niter=niter, **kw
        )

        def pooled_ess(out):
            chains = np.transpose(np.asarray(out.x[:, 0]), (2, 0, 1))  # [C, rows, D]
            return float(np.min(diagnostics.multichain_ess(chains)))

        ess_frozen = pooled_ess(out_frozen)
        ess_adapt = pooled_ess(out_adapt)
        assert ess_adapt > 5.0 * ess_frozen, (ess_adapt, ess_frozen)


class TestPTSamplerWiring:
    def test_massadapt_kwarg_reaches_config(self, tmp_path):
        ndim = 2

        def lnlike(x):
            return -0.5 * jnp.sum(x**2)

        def lnprior(x):
            return jnp.where(jnp.all(jnp.abs(x) < 10.0), 0.0, -jnp.inf)

        s = PTSampler(
            ndim, lnlike, lnprior, np.eye(ndim),
            logl_grad=jax.value_and_grad(lnlike),
            logp_grad=lambda x: (lnprior(x), jnp.zeros_like(x)),
            ntemps=1, nchains=8, outDir=str(tmp_path / "c"),
            verbose=False, seed=1,
        )
        s.sample(
            np.zeros(ndim), 60, burn=20, thin=1, isave=20, covUpdate=20,
            SCAMweight=5, AMweight=5, DEweight=0, HMCweight=5,
            NUTSweight=0, MALAweight=0, massAdapt=True,
        )
        assert s.config.mass_adapt is True
        chol = np.asarray(s.state.adapt.chol, np.float64)
        np.testing.assert_allclose(
            chol @ chol.T, np.asarray(s.state.adapt.cov, np.float64),
            rtol=1e-3, atol=1e-4,
        )
