"""ChEES-HMC tests: adaptation behavior and sampling correctness on Gaussian
targets (beyond-reference mode; see proposals/chees.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from ptmcmcsampler_tpu.config import KIND_CHEES, JumpSpec, SamplerConfig
from ptmcmcsampler_tpu.kernel import build_step
from ptmcmcsampler_tpu.state import init_state


def build(ndim=4, nchains=64, burn=300, scale=1.0, max_steps=64, stepsize=0.2):
    s2 = scale * scale

    def logl(x):
        return -0.5 * jnp.sum(x**2) / s2

    def logp(x):
        return jnp.where(jnp.all(jnp.abs(x) < 50.0), 0.0, -jnp.inf)

    def func_grad(x, beta):
        return beta * (-0.5 * jnp.sum(x**2) / s2), beta * (-x / s2)

    cfg = SamplerConfig(
        ndim=ndim,
        ntemps=1,
        nchains=nchains,
        groups=(tuple(range(ndim)),),
        jumps=(JumpSpec("ChEESHMCJump", KIND_CHEES, 1),),
        tskip=10**9,
        cov_update=10**9,
        burn=burn,
        thin=1,
        de_size=16,
        hmc_stepsize=stepsize,
        chees_max_steps=max_steps,
    )
    step, run_block = build_step(cfg, logl, logp, func_grad)
    x0 = np.zeros(ndim)
    xs = jnp.zeros((1, nchains, ndim))
    ll0 = jax.vmap(jax.vmap(logl))(xs)
    lp0 = jax.vmap(jax.vmap(logp))(xs)
    state = init_state(
        cfg, jax.random.PRNGKey(0), x0, np.eye(ndim) * s2, np.array([1.0]), ll0, lp0
    )
    return cfg, step, run_block, state


class TestChees:
    def test_adapts_and_samples_gaussian(self):
        cfg, step, run_block, state = build()
        state, _ = run_block(state, cfg.burn)  # burn-in: adaptation active
        eps_burn = float(jax.device_get(state.stepsize.chees_eps[0, 0]))
        tlen = float(jax.device_get(state.stepsize.chees_tlen[0, 0]))
        assert eps_burn > 0 and np.isfinite(eps_burn)
        assert tlen >= eps_burn
        # Trajectory length should have grown beyond a single step for a
        # unit Gaussian (optimal integration time ~ pi/2 * sigma).
        assert tlen > 2 * eps_burn

        state, out = run_block(state, 1500)
        # Post-burn-in: eps frozen at the dual-averaged value.
        eps_frozen = np.asarray(jax.device_get(state.stepsize.chees_eps))
        assert np.allclose(eps_frozen, eps_frozen[0, 0])
        samples = np.asarray(jax.device_get(out.x))[500:, 0].reshape(-1, cfg.ndim)
        assert abs(samples.mean()) < 0.05
        np.testing.assert_allclose(samples.var(axis=0), 1.0, rtol=0.12)
        # Healthy acceptance (target 0.651, generous window).
        acc = np.asarray(jax.device_get(state.counters.naccepted)).mean() / float(
            jax.device_get(state.it)
        )
        assert 0.4 < acc <= 1.0

    def test_scale_invariance_via_mass_matrix(self):
        # With cov0 matched to the target scale, whitening makes the problem
        # unit-scale: adaptation should find a similar eps as the unit case.
        cfg, _, run_block, state = build(scale=10.0)
        state, out = run_block(state, cfg.burn + 800)
        samples = np.asarray(jax.device_get(out.x))[-500:, 0].reshape(-1, cfg.ndim)
        np.testing.assert_allclose(samples.var(axis=0), 100.0, rtol=0.15)

    def test_sampler_api_cheesweight(self, tmp_path):
        from ptmcmcsampler_tpu import PTSampler

        ndim = 3
        s = PTSampler(
            ndim,
            lambda x: -0.5 * jnp.sum(x**2),
            lambda x: jnp.where(jnp.all(jnp.abs(x) < 20.0), 0.0, -jnp.inf),
            np.eye(ndim),
            logl_grad=lambda x: (-0.5 * jnp.sum(x**2), -x),
            logp_grad=lambda x: (jnp.zeros(()), jnp.zeros(ndim)),
            outDir=str(tmp_path / "chains"),
            verbose=False,
            ntemps=2,
            nchains=8,
            seed=2,
        )
        s.sample(
            np.zeros(ndim), 200, burn=50, thin=1, isave=100,
            SCAMweight=1, AMweight=1, DEweight=0, NUTSweight=0, HMCweight=0,
            MALAweight=0, CHEESweight=5,
        )
        assert s.chain.shape[0] == 201
        names = s.config.jump_names()
        assert "ChEESHMCJump" in names
