"""Fused NUTS Pallas tree kernel vs the iterative XLA path.

``ops/nuts_pallas.py`` pre-draws all randomness as batched arrays (so its key
layout differs from the XLA path's in-loop splits); the two paths therefore
cannot be pinned bit-for-bit like the HMC kernel. Instead these tests pin
them *in law*: the distribution over proposed points, the acceptance
statistic (alpha, nalpha), divergence behavior at huge step sizes, and the
dual-averaging trajectory must agree statistically. Runs under the Pallas
interpreter on the CPU test backend (conftest), exercising the exact kernel
code that compiles on TPU.

Reference semantics for both paths: ``NUTSJump`` (nutsjump.py:379-840).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ptmcmcsampler_tpu.config import JumpSpec, SamplerConfig
from ptmcmcsampler_tpu.kernel import build_step
from ptmcmcsampler_tpu.ops import make_nuts_pallas
from ptmcmcsampler_tpu.proposals import nuts as nuts_mod
from ptmcmcsampler_tpu.proposals.base import ProposalContext
from ptmcmcsampler_tpu.state import init_state
from ptmcmcsampler_tpu.utils import split_grid


def _gauss_model(cov):
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


def _cfg(ndim, nchains, max_depth=5, force_eps=None, burn=10**6, **kw):
    return SamplerConfig(
        ndim=ndim, ntemps=1, nchains=nchains, groups=(tuple(range(ndim)),),
        jumps=(JumpSpec("NUTSJUMP", "nuts", 10),),
        nuts_max_depth=max_depth, nuts_force_epsilon=force_eps,
        burn=burn, thin=1, tskip=10**9, cov_update=10**9, de_size=16, **kw,
    )


def _ctx(ndim, cov=None):
    cov = np.eye(ndim) if cov is None else cov
    chol = np.linalg.cholesky(cov)
    return ProposalContext(
        group_u=(jnp.eye(ndim),), group_s=(jnp.ones(ndim),),
        chol=jnp.asarray(chol, jnp.float32),
        chol_inv=jnp.asarray(np.linalg.solve(chol, np.eye(ndim)), jnp.float32),
        de_buf=jnp.zeros((ndim, 4)), de_valid=jnp.asarray(0, jnp.int32),
    )


def _ss(t, c, eps0=-1.0):
    """Step-size state; ``eps0 > 0`` pre-seeds epsilon so the tree runs at a
    known step size while dual averaging still executes (unlike
    nuts_force_epsilon, which skips DA in both paths)."""
    z = jnp.zeros((t, c), jnp.float32)
    return dict(
        epsilon=z + eps0, epsilonbar=z + 1.0, hbar=z, mu=z, ncalls=z,
    )


def _run_one_call(path, cfg, func_grad, x, ctx, seed, it=1, eps0=-1.0):
    """One batched NUTS proposal: returns (q [T,C,D], qxy, alpha-stats dict)."""
    t, c, d = x.shape
    keys = split_grid(jax.random.key(seed), (t, c))
    ss = _ss(t, c, eps0)
    if path == "pallas":
        kern = make_nuts_pallas(cfg, func_grad)
        q, qxy, new_ss = jax.jit(
            lambda k, xx, ss: kern(k, xx, jnp.ones((t,)), it, ctx, ss)
        )(keys, x, ss)
    else:
        kern = nuts_mod.make_nuts(cfg, func_grad)
        per_chain = jax.vmap(
            lambda k, xx, s: kern(k, xx, jnp.ones(()), it, ctx, s),
            in_axes=(0, 0, 0),
        )
        q, qxy, new_ss = jax.jit(jax.vmap(per_chain))(keys, x, ss)
    return np.asarray(q), np.asarray(qxy), {k: np.asarray(v) for k, v in new_ss.items()}


class TestSingleTreeLaw:
    """Same start point, fixed step size: the proposal distribution over many
    independent trees must agree between the two implementations."""

    def _draw_trees(self, path, cov, nchains=512, eps=0.35, depth=4, seed=0):
        ndim = cov.shape[0]
        cfg = _cfg(ndim, nchains, max_depth=depth)
        _, _, func_grad = _gauss_model(cov)
        ctx = _ctx(ndim, cov)
        x0 = np.full((1, nchains, ndim), 0.7, np.float32)
        return _run_one_call(path, cfg, func_grad, jnp.asarray(x0), ctx, seed, eps0=eps)

    @pytest.mark.slow
    def test_proposal_distribution_matches_xla(self):
        cov = np.array([[1.0, 0.6], [0.6, 2.0]], np.float64)
        qp, qxyp, ssp = self._draw_trees("pallas", cov, seed=0)
        qx, qxyx, ssx = self._draw_trees("xla", cov, seed=1)
        qp2 = qp.reshape(-1, 2)
        qx2 = qx.reshape(-1, 2)
        # One-tree proposal clouds from the same start agree in location and
        # spread (both target the same trajectory law).
        se = np.sqrt(np.var(qx2, axis=0) / len(qx2)) * 4 + 0.05
        np.testing.assert_allclose(qp2.mean(axis=0), qx2.mean(axis=0), atol=se.max())
        np.testing.assert_allclose(
            qp2.std(axis=0), qx2.std(axis=0), rtol=0.15
        )
        # qxy = logp0 - logp_prop: same distribution
        assert abs(np.mean(qxyp) - np.mean(qxyx)) < 0.2
        # dual-averaging consumed the same per-tree statistic in law:
        # hbar after one call encodes alpha/nalpha.
        assert abs(ssp["hbar"].mean() - ssx["hbar"].mean()) < 0.03

    @pytest.mark.slow
    def test_tree_size_distribution_matches(self):
        """nalpha (total leapfrog leaves taken) is the acceptance-statistic
        denominator; its distribution is a sharp fingerprint of the doubling
        /U-turn/checkpoint logic."""
        cov = np.eye(2)
        cfg = _cfg(2, 512, max_depth=4)
        _, _, func_grad = _gauss_model(cov)
        ctx = _ctx(2, cov)
        x0 = jnp.full((1, 512, 2), 0.7, jnp.float32)

        def stats(path, seed):
            # alpha/nalpha land in hbar via eta*(delta - alpha/nalpha) with
            # known eta, delta; recover the mean acceptance statistic.
            _, _, ss = _run_one_call(path, cfg, func_grad, x0, ctx, seed, eps0=0.35)
            eta = 1.0 / (1.0 + 10.0)
            mean_accstat = cfg.nuts_delta - ss["hbar"].mean() / eta
            return mean_accstat

        a_p = stats("pallas", 3)
        a_x = stats("xla", 4)
        # Mean Metropolis-averaged acceptance within MC error of each other.
        assert abs(a_p - a_x) < 0.04, (a_p, a_x)

    def test_divergence_at_huge_epsilon(self):
        """At eps=50 every first leaf diverges: the proposal must stay at the
        start point and alpha ~ 0, identically in both paths."""
        cov = np.eye(2)
        cfg = _cfg(2, 64, max_depth=4)
        _, _, func_grad = _gauss_model(cov)
        ctx = _ctx(2, cov)
        x0 = jnp.full((1, 64, 2), 0.3, jnp.float32)
        for path, seed in (("pallas", 5), ("xla", 6)):
            q, qxy, ss = _run_one_call(path, cfg, func_grad, x0, ctx, seed, eps0=50.0)
            np.testing.assert_allclose(
                q.reshape(-1, 2), np.asarray(x0).reshape(-1, 2), atol=1e-5,
                err_msg=path,
            )
            # acceptance statistic ~ 0 -> hbar jumped toward delta
            eta = 1.0 / 11.0
            accstat = cfg.nuts_delta - ss["hbar"] / eta
            assert np.all(accstat < 0.05), path


class TestSamplingMoments:
    @pytest.mark.slow
    def test_kernel_level_moments_match_target_and_xla(self):
        """Full MH kernel with the Pallas NUTS branch on a correlated Gaussian
        (identity mass; the tree must do the work): moments match the target
        and the XLA-path run."""
        cov = np.array([[1.0, 0.8], [0.8, 2.0]])
        logl, logp, func_grad = _gauss_model(cov)
        nchains = 64
        results = {}
        for use_pallas, seed in ((True, 0), (False, 1)):
            cfg = _cfg(2, nchains, max_depth=4, burn=150, use_pallas=use_pallas)
            _, run_block = build_step(cfg, logl, logp, func_grad)
            xs = jnp.zeros((1, nchains, 2))
            ll0 = jax.vmap(jax.vmap(logl))(xs)
            lp0 = jax.vmap(jax.vmap(logp))(xs)
            state = init_state(
                cfg, jax.random.PRNGKey(seed), np.zeros(2), np.eye(2),
                np.ones(1), ll0, lp0,
            )
            state, _ = run_block(state, 200)
            state, out = run_block(state, 300)
            samples = np.moveaxis(np.asarray(out.x[:, 0]), 1, 2).reshape(-1, 2)
            results[use_pallas] = samples
            emp = np.cov(samples.T)
            np.testing.assert_allclose(emp, cov, atol=0.3, err_msg=str(use_pallas))
            np.testing.assert_allclose(
                samples.mean(axis=0), [0, 0], atol=0.12, err_msg=str(use_pallas)
            )
        np.testing.assert_allclose(
            np.cov(results[True].T), np.cov(results[False].T), atol=0.3
        )

    @pytest.mark.slow
    def test_dual_averaging_converges_like_xla(self):
        """Adaptive step size: after N calls, the dual-averaged epsilon
        distribution must agree between paths (same equations, same law)."""
        cov = np.eye(3)
        logl, logp, func_grad = _gauss_model(cov)
        nchains = 32
        eps = {}
        for use_pallas, seed in ((True, 2), (False, 3)):
            cfg = _cfg(3, nchains, max_depth=4, burn=10**6, use_pallas=use_pallas)
            _, run_block = build_step(cfg, logl, logp, func_grad)
            xs = jnp.zeros((1, nchains, 3))
            ll0 = jax.vmap(jax.vmap(logl))(xs)
            lp0 = jax.vmap(jax.vmap(logp))(xs)
            state = init_state(
                cfg, jax.random.PRNGKey(seed), np.zeros(3), np.eye(3),
                np.ones(1), ll0, lp0,
            )
            state, _ = run_block(state, 120)
            e = np.asarray(state.stepsize.epsilon)
            assert np.all(e > 0) and np.all(np.isfinite(e))
            eps[use_pallas] = np.log(e)
        # log-eps agrees across paths within cross-chain spread.
        spread = eps[False].std() + 1e-3
        assert abs(eps[True].mean() - eps[False].mean()) < 3 * spread + 0.25, (
            eps[True].mean(), eps[False].mean(), spread,
        )


class TestDepth8Unroll:
    @pytest.mark.slow
    def test_depth8_compiles_and_runs(self):
        """max_depth=8 statically unrolls 255 leaves; it must trace, compile
        (interpret mode here; TPU measurement in tools/nuts_probe.py) and
        produce finite output."""
        cov = np.eye(2)
        cfg = _cfg(2, 8, max_depth=8)
        _, _, func_grad = _gauss_model(cov)
        ctx = _ctx(2, cov)
        x0 = jnp.full((1, 8, 2), 0.4, jnp.float32)
        q, qxy, ss = _run_one_call("pallas", cfg, func_grad, x0, ctx, 7, eps0=0.5)
        assert np.all(np.isfinite(q))
        assert np.all(np.isfinite(qxy))

    @pytest.mark.slow
    def test_depth10_compiles_and_runs(self):
        """Depth 10 = the kernel's new cap (1023 leaves; matches the
        reference-unbounded regime in practice): finite outputs through the
        interpreter."""
        cov = np.eye(2)
        cfg = _cfg(2, 4, max_depth=10)
        _, _, func_grad = _gauss_model(cov)
        ctx = _ctx(2, cov)
        x0 = jnp.full((1, 4, 2), 0.4, jnp.float32)
        q, qxy, ss = _run_one_call("pallas", cfg, func_grad, x0, ctx, 11, eps0=0.5)
        assert np.all(np.isfinite(q))
        assert np.all(np.isfinite(qxy))


class TestNutsImplGating:
    """nuts_impl dispatch (proposals/cycle.py): "auto" rides the fused Pallas
    kernel only on TPU (or with the legacy use_pallas opt-in); "pallas"/"xla"
    force a path; the depth/trajectory constraints always win."""

    def _pallas_selected(self, monkeypatch, **cfg_kw):
        import ptmcmcsampler_tpu.ops as ops_pkg
        from ptmcmcsampler_tpu.proposals.cycle import build_jump_branches

        calls = []
        real = ops_pkg.make_nuts_pallas

        def counting(config, func_grad, interpret=None):
            calls.append(1)
            return real(config, func_grad, interpret)

        monkeypatch.setattr(ops_pkg, "make_nuts_pallas", counting)
        cfg = _cfg(2, 4, max_depth=cfg_kw.pop("max_depth", 5), **cfg_kw)
        _, _, func_grad = _gauss_model(np.eye(2))
        build_jump_branches(cfg, func_grad=func_grad)
        return bool(calls)

    def test_auto_on_cpu_uses_xla(self, monkeypatch):
        # conftest forces the CPU backend; auto must pick the XLA path there.
        assert not self._pallas_selected(monkeypatch)

    def test_forced_pallas(self, monkeypatch):
        assert self._pallas_selected(monkeypatch, nuts_impl="pallas")

    def test_legacy_use_pallas_optin(self, monkeypatch):
        assert self._pallas_selected(monkeypatch, use_pallas=True)

    def test_forced_xla_overrides_optin(self, monkeypatch):
        assert not self._pallas_selected(
            monkeypatch, nuts_impl="xla", use_pallas=True
        )

    def test_depth_10_rides_pallas(self, monkeypatch):
        # The reference's doubling loop is unbounded (nutsjump.py:716); the
        # kernel now covers depth 10, so the out-of-the-box NUTSmaxdepth=10
        # configuration rides the fast path (round-4 verdict item).
        assert self._pallas_selected(monkeypatch, nuts_impl="pallas", max_depth=10)

    def test_forced_pallas_raises_when_unsatisfiable(self, monkeypatch):
        # A forced Pallas path must not silently fall back to XLA (the user
        # would benchmark the wrong implementation): depth > cap raises.
        with pytest.raises(ValueError, match="nuts_impl='pallas'"):
            self._pallas_selected(monkeypatch, nuts_impl="pallas", max_depth=11)

    def test_auto_depth_cap_falls_back(self, monkeypatch):
        # "auto" + legacy opt-in with depth > cap quietly uses the XLA path.
        assert not self._pallas_selected(
            monkeypatch, use_pallas=True, max_depth=11
        )


class TestTwoPassDispatch:
    """The two-pass depth-bucketed dispatch (pass 1 shallow for all lanes,
    cap-cut lanes packed and replayed at full depth) must be BITWISE the
    plain full-depth kernel: identical randomness via the per-level
    reservoir streams, and completed lanes' shallow outputs are already the
    full-depth outputs."""

    @pytest.mark.parametrize("d1", [1, 2, 3])
    def test_bitwise_equals_single_pass(self, d1):
        import dataclasses

        cov = np.array([[1.0, 0.6], [0.6, 2.0]], np.float64)
        _, _, func_grad = _gauss_model(cov)
        ctx = _ctx(2, cov)
        x0 = jnp.asarray(np.full((1, 96, 2), 0.7, np.float32))
        cfg0 = _cfg(2, 96, max_depth=5, nuts_pass1_depth=0)
        cfgp = dataclasses.replace(cfg0, nuts_pass1_depth=d1)
        q0, qxy0, ss0 = _run_one_call("pallas", cfg0, func_grad, x0, ctx, 3, eps0=0.35)
        qp, qxyp, ssp = _run_one_call("pallas", cfgp, func_grad, x0, ctx, 3, eps0=0.35)
        np.testing.assert_array_equal(q0, qp)
        np.testing.assert_array_equal(qxy0, qxyp)
        for k in ss0:
            np.testing.assert_array_equal(ss0[k], ssp[k], err_msg=k)

    def test_mixed_depths_actually_route_both_passes(self):
        """With a step size giving a spread of tree depths, some lanes must
        complete in pass 1 and some must be cap-cut (otherwise the bitwise
        test above would be vacuous)."""
        from ptmcmcsampler_tpu.ops.nuts_pallas import fused_nuts_trees, make_nuts_pallas  # noqa: F401

        cov = np.array([[1.0, 0.6], [0.6, 2.0]], np.float64)
        _, _, func_grad = _gauss_model(cov)
        ctx = _ctx(2, cov)
        rng = np.random.default_rng(0)
        n, d = 128, 2
        q0 = jnp.asarray(rng.normal(0, 1, (n, d)), jnp.float32)
        r0 = jnp.asarray(rng.normal(0, 1, (n, d)), jnp.float32)
        beta = jnp.ones((n,))
        eps = jnp.full((n,), 0.35)
        expo = jnp.asarray(rng.exponential(size=n), jnp.float32)
        dirs = jnp.asarray(np.sign(rng.normal(size=(n, 2))), jnp.float32)
        accu = jnp.asarray(rng.uniform(size=(n, 2)), jnp.float32)
        resu = jnp.asarray(rng.uniform(size=(n, 3)), jnp.float32)
        *_, alive = fused_nuts_trees(
            q0, r0, beta, eps, expo, dirs, accu, resu, ctx.chol,
            func_grad=func_grad, ndim=d, max_depth=2,
        )
        alive = np.asarray(alive)
        assert alive.sum() > 0  # some trees cut by the depth-2 cap
        assert alive.sum() < n  # some completed
