"""Unit tests for core math kernels against closed forms and the reference's
formulas (SURVEY.md §7 build order step 1)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ptmcmcsampler_tpu import adaptation, diagnostics, ladder, utils
from ptmcmcsampler_tpu.config import SamplerConfig, JumpSpec, KIND_AM
from ptmcmcsampler_tpu.state import init_adapt_state


def _mini_config(ndim=4, groups=None):
    return SamplerConfig(
        ndim=ndim,
        ntemps=1,
        nchains=1,
        groups=groups or ((tuple(range(ndim))),),
        jumps=(JumpSpec("am", KIND_AM, 1),),
    )


class TestLadder:
    def test_default_spacing(self):
        # c = 1 + sqrt(2/ndim) (PTMCMCSampler.py:711)
        lad = ladder.temperature_ladder(ndim=8, ntemps=4)
        c = 1 + np.sqrt(2 / 8)
        np.testing.assert_allclose(lad, [c**i for i in range(4)])

    def test_tmax_spacing(self):
        lad = ladder.temperature_ladder(ndim=8, ntemps=5, tmin=1.0, tmax=16.0)
        np.testing.assert_allclose(lad, [1, 2, 4, 8, 16], rtol=1e-12)

    def test_single_chain(self):
        np.testing.assert_array_equal(ladder.temperature_ladder(8, 1), [1.0])

    def test_hot_chain(self):
        lad, betas = ladder.ladder_betas(np.array([1.0, 2.0, 4.0]), hot_chain=True)
        assert lad[-1] == 1e80
        assert betas[-1] == 1e-80


class TestTemperedLnprob:
    def test_basic(self):
        out = utils.tempered_lnprob(jnp.asarray(-10.0), jnp.asarray(-1.0), jnp.asarray(0.5))
        assert float(out) == pytest.approx(-6.0)

    def test_neginf_prior_dominates(self):
        out = utils.tempered_lnprob(jnp.asarray(-10.0), jnp.asarray(-jnp.inf), jnp.asarray(0.5))
        assert np.isneginf(float(out))

    def test_neginf_like_at_zero_beta(self):
        # hot chain still rejects -inf likelihood (reference temp=1e80 math)
        out = utils.tempered_lnprob(jnp.asarray(-jnp.inf), jnp.asarray(0.0), jnp.asarray(0.0))
        assert np.isneginf(float(out))
        assert not np.isnan(float(out))


class TestWelford:
    def test_matches_numpy_cov(self):
        rng = np.random.default_rng(0)
        xs = rng.normal(size=(500, 4)).astype(np.float32) * np.array([1, 2, 3, 4], np.float32)
        cfg = _mini_config(4)
        adapt = init_adapt_state(cfg, np.eye(4))
        # feed in uneven batches, like per-iteration chain batches
        i = 0
        for m in [3, 50, 121, 200, 126]:
            adapt = adaptation.welford_batch_update(adapt, jnp.asarray(xs[i : i + m]))
            i += m
        adapt = adaptation.refresh_factors(cfg, adapt)
        np.testing.assert_allclose(
            np.asarray(adapt.cov), np.cov(xs.T), rtol=2e-3, atol=2e-3
        )

    def test_sequential_equals_batched(self):
        rng = np.random.default_rng(1)
        xs = rng.normal(size=(64, 3)).astype(np.float32)
        cfg = _mini_config(3)
        a1 = init_adapt_state(cfg, np.eye(3))
        for row in xs:
            a1 = adaptation.welford_batch_update(a1, jnp.asarray(row[None]))
        a2 = init_adapt_state(cfg, np.eye(3))
        a2 = adaptation.welford_batch_update(a2, jnp.asarray(xs))
        np.testing.assert_allclose(np.asarray(a1.m2), np.asarray(a2.m2), rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(a1.mean), np.asarray(a2.mean), rtol=1e-4, atol=1e-4)

    def test_group_factors(self):
        cfg = _mini_config(4, groups=((0, 1), (2, 3)))
        rng = np.random.default_rng(2)
        xs = rng.normal(size=(2000, 4)).astype(np.float32)
        xs[:, 1] += 2 * xs[:, 0]
        adapt = init_adapt_state(cfg, np.eye(4))
        adapt = adaptation.welford_batch_update(adapt, jnp.asarray(xs))
        adapt = adaptation.refresh_factors(cfg, adapt)
        cov = np.cov(xs.T)
        for gi, g in enumerate(cfg.groups):
            sub = cov[np.ix_(g, g)]
            u = np.asarray(adapt.group_u[gi])
            s = np.asarray(adapt.group_s[gi])
            np.testing.assert_allclose(u @ np.diag(s) @ u.T, sub, rtol=5e-2, atol=5e-2)


class TestDEBuffer:
    def test_ring_write(self):
        from ptmcmcsampler_tpu.state import DEState

        de = DEState(buf=jnp.zeros((8, 2)), filled=jnp.zeros((), jnp.int32))
        for k in range(5):
            xs = jnp.full((2, 2), float(k))
            de = adaptation.de_buffer_push(de, xs)
        assert int(de.filled) == 10
        assert int(adaptation.de_valid_rows(de)) == 8
        buf = np.asarray(de.buf)
        # rows 0..1 were overwritten by k=4 (wraparound)
        np.testing.assert_array_equal(buf[0], [4, 4])
        np.testing.assert_array_equal(buf[2], [1, 1])


class TestDiagnostics:
    def test_iid_tau_near_one(self):
        rng = np.random.default_rng(3)
        x = rng.normal(size=20000)
        tau = diagnostics.integrated_autocorr_time(x)
        assert 0.5 < tau < 2.0

    def test_ar1_tau(self):
        rng = np.random.default_rng(4)
        rho = 0.9
        n = 200000
        x = np.empty(n)
        x[0] = 0
        eps = rng.normal(size=n)
        for i in range(1, n):
            x[i] = rho * x[i - 1] + eps[i]
        tau = diagnostics.integrated_autocorr_time(x)
        expected = (1 + rho) / (1 - rho)  # = 19
        assert expected * 0.7 < tau < expected * 1.3

    def test_split_rhat_converged_vs_not(self):
        rng = np.random.default_rng(5)
        # converged: 8 iid N(0,1) chains
        good = rng.normal(size=(8, 2000, 2))
        r_good = diagnostics.split_rhat(good)
        assert np.all(r_good < 1.01), r_good
        # non-converged: chains stuck at different means
        bad = good + np.arange(8)[:, None, None]
        r_bad = diagnostics.split_rhat(bad)
        assert np.all(r_bad > 1.5), r_bad
        # within-chain drift is caught by the split (single chain, trend)
        drift = np.linspace(0, 5, 4000)[None, :, None] + rng.normal(
            size=(1, 4000, 1)
        )
        assert diagnostics.split_rhat(drift)[0] > 1.2
