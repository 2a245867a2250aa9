"""Step-kernel tests: trace/compile correctness and statistical sanity of the
full MH + swap + adaptation iteration on a known Gaussian target."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ptmcmcsampler_tpu.config import SamplerConfig, build_default_jumps
from ptmcmcsampler_tpu.kernel import build_step
from ptmcmcsampler_tpu.ladder import ladder_betas, temperature_ladder
from ptmcmcsampler_tpu.state import init_state


def make_gaussian(ndim, sigma=1.0):
    def logl(x):
        return -0.5 * jnp.sum((x / sigma) ** 2)

    def logp(x):
        inside = jnp.all(jnp.abs(x) < 50.0)
        return jnp.where(inside, 0.0, -jnp.inf)

    return logl, logp


def build(ndim=3, ntemps=2, nchains=8, burn=50, seed=0, **kw):
    logl, logp = make_gaussian(ndim)
    cfg = SamplerConfig(
        ndim=ndim,
        ntemps=ntemps,
        nchains=nchains,
        groups=(tuple(range(ndim)),),
        jumps=build_default_jumps(burn=burn),
        tskip=10,
        cov_update=50,
        burn=burn,
        thin=2,
        de_size=100,
        **kw,
    )
    step, run_block = build_step(cfg, logl, logp)
    ladder = temperature_ladder(ndim, ntemps)
    _, betas = ladder_betas(ladder)
    x0 = np.zeros(ndim) + 0.5
    xs = jnp.broadcast_to(jnp.asarray(x0, jnp.float32), (ntemps, nchains, ndim))
    ll0 = jax.vmap(jax.vmap(logl))(xs)
    lp0 = jax.vmap(jax.vmap(logp))(xs)
    state = init_state(cfg, jax.random.PRNGKey(seed), x0, np.eye(ndim) * 0.1, betas, ll0, lp0)
    return cfg, step, run_block, state


class TestStep:
    def test_single_step_shapes(self):
        cfg, step, _, state = build()
        new = jax.jit(step)(state)
        assert new.x.shape == state.x.shape
        assert int(new.it) == 1
        assert np.all(np.isfinite(np.asarray(new.lnlike)))

    def test_run_block(self):
        cfg, _, run_block, state = build()
        state, out = run_block(state, 10)
        assert out.x.shape == (10, cfg.ntemps, cfg.ndim, cfg.nchains)  # chain-minor
        assert int(state.it) == 20  # 10 rows * thin 2
        assert np.all(np.isfinite(np.asarray(out.lnprob)))

    def test_acceptance_nonzero(self):
        cfg, _, run_block, state = build()
        state, _ = run_block(state, 100)
        acc = np.asarray(state.counters.naccepted)
        it = int(state.it)
        rate = acc.mean() / it
        assert 0.05 < rate < 0.95

    def test_counters_consistent(self):
        cfg, _, run_block, state = build()
        state, _ = run_block(state, 50)
        proposed = np.asarray(state.counters.jump_proposed).sum(axis=0)
        assert np.all(proposed == int(state.it))
        accepted = np.asarray(state.counters.jump_accepted).sum(axis=0)
        np.testing.assert_array_equal(accepted, np.asarray(state.counters.naccepted))

    def test_swaps_happen(self):
        cfg, _, run_block, state = build(ntemps=4)
        state, _ = run_block(state, 200)
        nevents = int(state.it) // cfg.tskip
        prop = np.asarray(state.counters.swaps_proposed)
        # sweep mode proposes every adjacent pair per event; last index unused
        np.testing.assert_array_equal(prop[:3], nevents)
        assert prop[3] == 0
        acc = np.asarray(state.counters.swaps_accepted)
        assert acc[:3].sum() > 0  # some adjacent-pair swaps accepted

    def test_deo_mode_runs(self):
        cfg, _, run_block, state = build(ntemps=4, swap_mode="deo")
        state, _ = run_block(state, 100)
        prop = np.asarray(state.counters.swaps_proposed)
        nevents = int(state.it) // cfg.tskip
        # DEO alternates parities: first event at it=tskip has parity 1
        # (pair (1,2) only), then parity 0 (pairs (0,1),(2,3)), ...
        assert prop[:3].sum() == 2 * (nevents // 2) + (nevents + 1) // 2
        assert np.asarray(state.counters.swaps_accepted)[:3].sum() > 0

    def test_per_chain_mode_runs(self):
        cfg, _, run_block, state = build(jump_select="per_chain")
        state, _ = run_block(state, 50)
        proposed = np.asarray(state.counters.jump_proposed)
        # different chains drew different kinds at least once
        assert (proposed.sum(axis=(1, 2)) > 0).sum() >= 2

    def test_de_activates_after_burn(self):
        cfg, _, run_block, state = build(burn=50)
        state, _ = run_block(state, 100)  # 200 iterations > burn
        names = cfg.jump_names()
        de_idx = names.index("DEJump")
        proposed = np.asarray(state.counters.jump_proposed)
        assert proposed[de_idx].sum() > 0

    def test_cov_adapts_toward_target(self):
        # after many iterations the adapted covariance should be near the
        # target's (identity * sigma^2 within the box), not the tiny initial
        cfg, _, run_block, state = build(nchains=32, ntemps=1)
        state, _ = run_block(state, 500)  # 1000 iters, cov_update=50
        cov = np.asarray(state.adapt.cov)
        assert np.all(np.diag(cov) > 0.05)
        assert np.all(np.isfinite(cov))


class TestStatistical:
    @pytest.mark.slow
    def test_gaussian_moments(self):
        ndim = 3
        cfg, _, run_block, state = build(ndim=ndim, ntemps=2, nchains=64, burn=100)
        state, _ = run_block(state, 500)  # burn-in: 1000 iters
        state, out = run_block(state, 1500)  # 3000 iters
        cold = np.moveaxis(np.asarray(out.x[:, 0]), 1, 2).reshape(-1, ndim)  # [rows*C, D]
        mean = cold.mean(axis=0)
        std = cold.std(axis=0)
        # Standard normal target; with 64 chains * 1500 rows the MC error on
        # the mean is well under 0.05 even with autocorrelation.
        np.testing.assert_allclose(mean, np.zeros(ndim), atol=0.12)
        np.testing.assert_allclose(std, np.ones(ndim), rtol=0.12)

    def test_hot_chain_hotter(self):
        # hotter chains should exhibit wider marginals
        cfg, _, run_block, state = build(ndim=2, ntemps=4, nchains=32, burn=100)
        state, out = run_block(state, 1000)
        cold_std = np.asarray(out.x[500:, 0]).std()
        hot_std = np.asarray(out.x[500:, -1]).std()
        assert hot_std > cold_std


class TestRngImpls:
    def test_rbg_keys_run_and_checkpoint(self, tmp_path):
        """The whole kernel + checkpoint path works on a non-threefry PRNG
        (rbg raw key data is uint32[4], exercising the typed-key plumbing)."""
        import os

        from ptmcmcsampler_tpu.io.checkpoint import load_checkpoint, save_checkpoint

        cfg, step, run_block, state0 = build()
        key = jax.random.key(5, impl="rbg")
        state = state0.replace(key=key)
        state, out = run_block(state, 5)
        assert np.isfinite(np.asarray(jax.device_get(out.x))).all()

        path = os.path.join(str(tmp_path), "ckpt.npz")
        save_checkpoint(path, state, meta={"iter": 5})
        template = state0.replace(key=jax.random.key(0, impl="rbg"))
        loaded, meta = load_checkpoint(path, template)
        assert meta["iter"] == 5
        # The restored key continues the same stream.
        s1 = jax.jit(step)(state)
        s2 = jax.jit(step)(loaded)
        np.testing.assert_array_equal(
            np.asarray(jax.device_get(s1.x)), np.asarray(jax.device_get(s2.x))
        )


class TestCheckpointPathKeys:
    """Checkpoint leaves are keyed by pytree path, not flatten order, so a
    state-layout change fails loudly instead of loading shifted arrays."""

    def test_legacy_index_keyed_file_rejected(self, tmp_path):
        import os

        from ptmcmcsampler_tpu.io.checkpoint import load_checkpoint, save_checkpoint

        cfg, step, run_block, state = build()
        path = os.path.join(str(tmp_path), "ckpt.npz")
        save_checkpoint(path, state)
        # Rewrite as the round-1 index-keyed layout.
        data = dict(np.load(path))
        legacy = {f"leaf_{i}": v for i, (k, v) in enumerate(sorted(data.items()))
                  if not k.startswith("__")}
        np.savez(path, **legacy)
        with pytest.raises(ValueError, match="legacy|unrecognized"):
            load_checkpoint(path, state)

    def test_missing_leaf_named_in_error(self, tmp_path):
        import os

        from ptmcmcsampler_tpu.io.checkpoint import load_checkpoint, save_checkpoint

        cfg, step, run_block, state = build()
        path = os.path.join(str(tmp_path), "ckpt.npz")
        save_checkpoint(path, state)
        data = dict(np.load(path))
        del data["adapt/cov"]
        np.savez(path, **data)
        with pytest.raises(ValueError, match="adapt/cov"):
            load_checkpoint(path, state)

    def test_same_shape_fields_load_by_name(self, tmp_path):
        """lnlike/lnprior have identical shapes; path keys must keep them
        apart even if flatten order changed."""
        import os

        from ptmcmcsampler_tpu.io.checkpoint import load_checkpoint, save_checkpoint

        cfg, step, run_block, state = build()
        state = state.replace(
            lnlike=jnp.full_like(state.lnlike, 3.0),
            lnprior=jnp.full_like(state.lnprior, -7.0),
        )
        path = os.path.join(str(tmp_path), "ckpt.npz")
        save_checkpoint(path, state)
        loaded, _ = load_checkpoint(path, state)
        np.testing.assert_array_equal(np.asarray(loaded.lnlike), 3.0)
        np.testing.assert_array_equal(np.asarray(loaded.lnprior), -7.0)
