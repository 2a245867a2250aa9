"""Adaptive temperature-ladder geometry (Vousden+ 2016 scheme) — the
beyond-reference capability from the north star ("temperature-ladder geometry
adaptation ... as pure functional state updates"; BASELINE.json config 5).
The reference's ladder is static (PTMCMCSampler.py:699-720)."""

import jax
import jax.numpy as jnp
import numpy as np

from ptmcmcsampler_tpu.config import SamplerConfig, build_default_jumps
from ptmcmcsampler_tpu.kernel import build_step
from ptmcmcsampler_tpu.ladder import adapt_ladder_betas, ladder_betas
from ptmcmcsampler_tpu.state import init_state


class TestAdaptLadderUnit:
    def test_endpoints_fixed_and_direction(self):
        betas = jnp.asarray(1.0 / np.geomspace(1.0, 100.0, 5), jnp.float32)
        # Pair 0 accepts much more than pair 1 -> spacing T1-T0 must grow
        # (dS > 0), pushing rung 1 hotter.
        rates = jnp.asarray([0.9, 0.1, 0.5, 0.5, 0.0], jnp.float32)
        new = adapt_ladder_betas(betas, rates, it=10, lag=100.0, time=1.0)
        new = np.asarray(new)
        old = np.asarray(betas)
        assert new[0] == old[0] and new[-1] == old[-1]  # endpoints fixed
        assert new[1] < old[1]  # rung 1 moved hotter (smaller beta)
        # monotone descending, strictly positive
        assert np.all(np.diff(new) < 0) and np.all(new > 0)

    def test_equal_rates_fixed_point(self):
        betas = jnp.asarray(1.0 / np.geomspace(1.0, 50.0, 6), jnp.float32)
        rates = jnp.full((6,), 0.3, jnp.float32)
        new = adapt_ladder_betas(betas, rates, it=5, lag=100.0, time=1.0)
        np.testing.assert_allclose(np.asarray(new), np.asarray(betas), rtol=1e-5)

    def test_persistent_imbalance_cannot_invert_ladder(self):
        """Regression: with a pathological persistent rate imbalance the
        interior rungs must never cross the fixed hottest rung (the spacings
        are rescaled into the available span instead of overflowing it)."""
        betas = jnp.asarray(1.0 / np.geomspace(1.0, 8.0, 4), jnp.float32)
        rates = jnp.asarray([1.0, 0.0, 0.0], jnp.float32)  # maximal ds forever
        for i in range(3000):
            betas = adapt_ladder_betas(betas, rates, it=i + 1, lag=100.0, time=5.0)
        b = np.asarray(betas)
        assert np.all(np.diff(b) < 0), b  # strictly descending (no inversion)
        assert b[-2] > b[-1] > 0, b  # interior stays above the fixed top rung

    def test_unproposed_pairs_do_not_move_geometry(self):
        """DEO's not-yet-proposed pairs (rate would read 0/0) must not drive
        spacing updates."""
        betas = jnp.asarray(1.0 / np.geomspace(1.0, 50.0, 6), jnp.float32)
        rates = jnp.asarray([0.8, 0.0, 0.8, 0.0, 0.0, 0.0], jnp.float32)
        valid = jnp.asarray([True, False, True, False, False, False])
        new = adapt_ladder_betas(
            betas, rates, it=1, lag=100.0, time=1.0, pair_valid=valid
        )
        # every ds touches an invalid pair -> geometry unchanged
        np.testing.assert_allclose(np.asarray(new), np.asarray(betas), rtol=1e-6)

    def test_skip_top_keeps_hot_rung(self):
        betas = jnp.asarray([1.0, 0.5, 0.2, 0.05, 0.0], jnp.float32)  # beta=0 hot chain
        rates = jnp.asarray([0.8, 0.2, 0.5, 0.0, 0.0], jnp.float32)
        new = np.asarray(
            adapt_ladder_betas(betas, rates, it=10, lag=100.0, time=1.0, skip_top=True)
        )
        assert new[-1] == 0.0  # hot chain untouched
        assert new[-2] == np.asarray(betas)[-2]  # new top endpoint fixed
        assert np.all(np.isfinite(new))


class TestWindowRates:
    def test_window_ignores_stale_cumulative_history(self):
        """The geometry update must feed on the delta since the last update,
        not lifetime rates: with a huge stale history of 90% acceptance and a
        recent window of 10%, the window rate is 0.1 (the cumulative rate
        would be ~0.9)."""
        from ptmcmcsampler_tpu.kernel import ladder_window_rates
        from ptmcmcsampler_tpu.state import Counters

        t, c = 4, 8
        stale_prop = np.full((t,), 1000, np.int32)
        stale_acc = np.full((t, c), 900, np.int32)
        win_prop = np.full((t,), 10, np.int32)
        win_acc = np.full((t, c), 1, np.int32)
        ctr = Counters(
            naccepted=jnp.zeros((t, c), jnp.int32),
            jump_proposed=jnp.zeros((1, t, c), jnp.int32),
            jump_accepted=jnp.zeros((1, t, c), jnp.int32),
            swaps_proposed=jnp.asarray(stale_prop + win_prop),
            swaps_accepted=jnp.asarray(stale_acc + win_acc),
            swaps_proposed_lad=jnp.asarray(stale_prop),
            swaps_accepted_lad=jnp.asarray(stale_acc),
        )
        rates, valid = ladder_window_rates(ctr, jnp.float32)
        np.testing.assert_allclose(np.asarray(rates), 0.1, rtol=1e-6)
        assert np.all(np.asarray(valid))

    def test_empty_window_flagged_invalid(self):
        from ptmcmcsampler_tpu.kernel import ladder_window_rates
        from ptmcmcsampler_tpu.state import Counters

        t, c = 3, 4
        prop = jnp.asarray([5, 0, 5], jnp.int32)
        ctr = Counters(
            naccepted=jnp.zeros((t, c), jnp.int32),
            jump_proposed=jnp.zeros((1, t, c), jnp.int32),
            jump_accepted=jnp.zeros((1, t, c), jnp.int32),
            swaps_proposed=prop,
            swaps_accepted=jnp.zeros((t, c), jnp.int32),
            swaps_proposed_lad=jnp.zeros((t,), jnp.int32),
            swaps_accepted_lad=jnp.zeros((t, c), jnp.int32),
        )
        _, valid = ladder_window_rates(ctr, jnp.float32)
        np.testing.assert_array_equal(np.asarray(valid), [True, False, True])


class TestAdaptLadderE2E:
    def _run(self, adapt, seed=0):
        ndim = 4

        def logl(x):
            return -0.5 * jnp.sum(x**2)

        def logp(x):
            return jnp.where(jnp.all(jnp.abs(x) < 30.0), 0.0, -jnp.inf)

        cfg = SamplerConfig(
            ndim=ndim, ntemps=6, nchains=64,
            groups=(tuple(range(ndim)),),
            jumps=build_default_jumps(burn=400),
            tskip=5, cov_update=200, burn=4000, thin=1, de_size=500,
            adapt_ladder=adapt, ladder_adapt_lag=1000.0, ladder_adapt_time=10.0,
        )
        step, run_block = build_step(cfg, logl, logp)
        # Deliberately terrible geometric ladder: Tmax=1e6 over 6 rungs.
        ladder = np.geomspace(1.0, 1e6, 6)
        _, betas = ladder_betas(ladder)
        xs = jnp.zeros((6, 64, ndim)) + 0.1
        ll0 = jax.vmap(jax.vmap(logl))(xs)
        lp0 = jax.vmap(jax.vmap(logp))(xs)
        state = init_state(
            cfg, jax.random.PRNGKey(seed), np.zeros(ndim) + 0.1,
            np.eye(ndim) * 0.5, betas, ll0, lp0,
        )
        state, _ = run_block(state, 1500)
        # measure post-adaptation window acceptance
        c0 = jax.device_get(state.counters)
        state, _ = run_block(state, 1500)
        c1 = jax.device_get(state.counters)
        dacc = (np.asarray(c1.swaps_accepted) - np.asarray(c0.swaps_accepted)).mean(
            axis=1
        )[:-1]
        dprop = (np.asarray(c1.swaps_proposed) - np.asarray(c0.swaps_proposed))[:-1]
        return dacc / np.maximum(dprop, 1), np.asarray(jax.device_get(state.betas))

    def test_adaptation_equalizes_and_raises_acceptance(self):
        rates_static, betas_static = self._run(adapt=False)
        rates_adapt, betas_adapt = self._run(adapt=True)
        # ladder actually moved
        assert not np.allclose(betas_adapt, betas_static)
        # endpoints pinned
        assert betas_adapt[0] == betas_static[0]
        np.testing.assert_allclose(betas_adapt[-1], betas_static[-1], rtol=1e-6)
        # a Tmax=1e6 six-rung geometric ladder has a cold bottleneck (pair-0
        # acceptance ~2%) while the hottest pairs swap for free (~100%);
        # adaptation must fix the bottleneck...
        assert rates_adapt.min() > rates_static.min() + 0.05, (
            rates_static, rates_adapt,
        )
        # ...by equalizing the profile across pairs (Vousden's objective)
        assert rates_adapt.std() < 0.5 * rates_static.std(), (
            rates_static.std(), rates_adapt.std(),
        )
