"""Pallas fused-trajectory kernels vs the vmapped XLA reference path.

Runs under the Pallas interpreter on the CPU test backend (see conftest), so
the exact kernel code that compiles on TPU is exercised here. The XLA path
(``proposals.gradient.make_hmc``) is itself validated statistically in
tests/test_gradient_jumps.py; these tests pin the Pallas kernel to it
bit-for-bit (same typed keys -> same momenta/lengths -> same trajectories).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ptmcmcsampler_tpu.config import SamplerConfig, build_default_jumps
from ptmcmcsampler_tpu.models import CurvedLikelihood, IntervalTransformedGaussian
from ptmcmcsampler_tpu.ops import make_hmc_pallas
from ptmcmcsampler_tpu.proposals import gradient
from ptmcmcsampler_tpu.proposals.base import ProposalContext
from ptmcmcsampler_tpu.utils import split_grid


def _setup(model, ntemps=3, nchains=7, seed=0, nmin=2, nmax=25, eps=0.05):
    ndim = model.ndim

    def func_grad(x, beta):
        ll, gll = model.lnlikefn_grad(x)
        lp, glp = model.lnpriorfn_grad(x)
        return beta * ll + lp, beta * gll + glp

    cfg = SamplerConfig(
        ndim=ndim, ntemps=ntemps, nchains=nchains,
        groups=(tuple(range(ndim)),),
        jumps=build_default_jumps(HMCweight=10, have_grads=True),
        hmc_stepsize=eps, hmc_nminsteps=nmin, hmc_nmaxsteps=nmax,
        use_pallas=True,
    )
    rng = np.random.default_rng(seed)
    cov = np.eye(ndim) * 0.2
    chol = np.linalg.cholesky(cov)
    ctx = ProposalContext(
        group_u=None, group_s=None,
        chol=jnp.asarray(chol, jnp.float32),
        chol_inv=jnp.asarray(np.linalg.inv(chol), jnp.float32),
        de_buf=None, de_valid=None,
    )
    x = jnp.asarray(
        rng.normal(0.0, 0.3, (ntemps, nchains, ndim)) + np.array([0.0, -1.0])[:ndim]
        if ndim == 2 else rng.normal(0.0, 0.3, (ntemps, nchains, ndim)),
        jnp.float32,
    )
    betas = jnp.asarray(np.geomspace(1.0, 0.1, ntemps), jnp.float32)
    keys = split_grid(jax.random.key(seed), (ntemps, nchains))
    return cfg, func_grad, ctx, x, betas, keys


def _xla_hmc_batch(cfg, func_grad, keys, x, betas, ctx):
    hmc = gradient.make_hmc(cfg, func_grad)
    per_chain = jax.vmap(lambda k, xx, b: hmc(k, xx, b, 0, ctx), in_axes=(0, 0, None))
    return jax.vmap(per_chain, in_axes=(0, 0, 0))(keys, x, betas)


@pytest.mark.parametrize("model", [CurvedLikelihood(), IntervalTransformedGaussian(ndim=5)])
def test_fused_hmc_matches_xla_path(model):
    cfg, func_grad, ctx, x, betas, keys = _setup(model)
    q_ref, qxy_ref = _xla_hmc_batch(cfg, func_grad, keys, x, betas, ctx)
    hmc_p = make_hmc_pallas(cfg, func_grad, interpret=True)
    q, qxy = hmc_p(keys, x, betas, ctx)
    assert q.shape == q_ref.shape and qxy.shape == qxy_ref.shape
    np.testing.assert_allclose(np.asarray(q), np.asarray(q_ref), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(qxy), np.asarray(qxy_ref), rtol=2e-3, atol=2e-3)


def test_fused_hmc_divergence_break():
    """Huge step size forces divergence: both paths must stop at the same
    (diverged) point and reject via qxy (nutsjump.py:285-289)."""
    model = CurvedLikelihood()
    cfg, func_grad, ctx, x, betas, keys = _setup(model, eps=5.0, nmin=10, nmax=30)
    q_ref, qxy_ref = _xla_hmc_batch(cfg, func_grad, keys, x, betas, ctx)
    hmc_p = make_hmc_pallas(cfg, func_grad, interpret=True)
    q, qxy = hmc_p(keys, x, betas, ctx)
    ref = np.asarray(qxy_ref)
    got = np.asarray(qxy)
    finite = np.isfinite(ref) & np.isfinite(got)
    # -inf/-inf (NaN-guarded) entries match by maskedness
    np.testing.assert_array_equal(np.isfinite(ref), np.isfinite(got))
    np.testing.assert_allclose(got[finite], ref[finite], rtol=1e-2, atol=1e-2)
    np.testing.assert_allclose(
        np.asarray(q)[finite], np.asarray(q_ref)[finite], rtol=1e-2, atol=1e-2
    )


@pytest.mark.parametrize(
    "model", [CurvedLikelihood(), IntervalTransformedGaussian(ndim=5)]
)
def test_fused_chees_matches_xla_path(model):
    """The fused ChEES trajectory kernel (ops/chees_pallas.py) must produce
    the same proposals, corrections, and adaptation-state updates as the
    vmapped XLA while_loop, given identical keys."""
    import dataclasses

    from ptmcmcsampler_tpu.proposals import chees as chees_mod

    cfg, func_grad, ctx, x, betas, keys = _setup(model, ntemps=2, nchains=9)
    x = jnp.moveaxis(x, 1, 2)  # batch-level chees kernel takes chain-minor x
    cfg_x = dataclasses.replace(cfg, use_pallas=False, chees_max_steps=32, burn=100)
    cfg_p = dataclasses.replace(cfg, use_pallas=True, chees_max_steps=32, burn=100)

    t, c = 2, 9
    ss = dict(
        chees_eps=jnp.full((t, c), 0.05, jnp.float32),
        chees_epsbar=jnp.full((t, c), 0.05, jnp.float32),
        chees_hbar=jnp.zeros((t, c), jnp.float32),
        chees_mu=jnp.zeros((t, c), jnp.float32),
        chees_count=jnp.zeros((t, c), jnp.float32),
        chees_m=jnp.zeros((t, c), jnp.float32),
        chees_v=jnp.zeros((t, c), jnp.float32),
        chees_tlen=jnp.full((t, c), 0.4, jnp.float32),
    )

    # The pallas path interprets off-TPU (fused_chees_trajectories defaults
    # interpret=True on CPU), so both run on the test backend.
    q_ref, qxy_ref, ss_ref = chees_mod.make_chees(cfg_x, func_grad)(
        keys, x, betas, 5, ctx, dict(ss)
    )
    q_p, qxy_p, ss_p = chees_mod.make_chees(cfg_p, func_grad)(
        keys, x, betas, 5, ctx, dict(ss)
    )
    np.testing.assert_allclose(np.asarray(q_p), np.asarray(q_ref), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(
        np.asarray(qxy_p), np.asarray(qxy_ref), rtol=2e-3, atol=2e-3
    )
    for k in ss:
        np.testing.assert_allclose(
            np.asarray(ss_p[k]), np.asarray(ss_ref[k]), rtol=2e-3, atol=2e-4,
            err_msg=k,
        )


def test_ptsampler_use_pallas_flag_wires_through(tmp_path):
    """PTSampler(use_pallas=True) must thread the flag into the compiled
    config and sample correctly (interpret mode on the CPU test backend)."""
    from ptmcmcsampler_tpu import PTSampler

    model = CurvedLikelihood()
    s = PTSampler(
        2, model.lnlikefn, model.lnpriorfn, np.eye(2) * 0.01,
        logl_grad=model.lnlikefn_grad, logp_grad=model.lnpriorfn_grad,
        ntemps=1, nchains=4, outDir=str(tmp_path / "c"), verbose=False,
        seed=9, use_pallas=True,
    )
    s.sample(np.array([-0.1, -0.5]), 40, burn=10, thin=1, isave=20,
             covUpdate=100, SCAMweight=5, AMweight=0, DEweight=0,
             NUTSweight=0, HMCweight=0, MALAweight=0, CHEESweight=5,
             HMCstepsize=0.05)
    assert s.config.use_pallas is True
    assert np.isfinite(s.chain).all()

    s2 = PTSampler(
        2, model.lnlikefn, model.lnpriorfn, np.eye(2) * 0.01,
        ntemps=1, nchains=4, outDir=str(tmp_path / "c2"), verbose=False, seed=9,
    )
    assert s2.use_pallas is False  # opt-in default (PROFILE_r02.md)


def test_kernel_sampler_with_pallas_hmc_runs():
    """End-to-end step kernel with use_pallas=True mixes the fused branch
    into the cycle and keeps sampling the right distribution shape."""
    from ptmcmcsampler_tpu.kernel import build_step
    from ptmcmcsampler_tpu.ladder import ladder_betas, temperature_ladder
    from ptmcmcsampler_tpu.state import init_state

    model = IntervalTransformedGaussian(ndim=4)

    def func_grad(x, beta):
        ll, gll = model.lnlikefn_grad(x)
        lp, glp = model.lnpriorfn_grad(x)
        return beta * ll + lp, beta * gll + glp

    cfg = SamplerConfig(
        ndim=4, ntemps=2, nchains=16, groups=(tuple(range(4)),),
        jumps=build_default_jumps(
            SCAMweight=5, AMweight=5, HMCweight=10, have_grads=True, burn=10
        ),
        tskip=10, cov_update=50, burn=10, thin=1, de_size=50,
        hmc_stepsize=0.2, hmc_nminsteps=2, hmc_nmaxsteps=20,
        use_pallas=True,
    )
    step, run_block = build_step(cfg, model.lnlikefn, model.lnpriorfn, func_grad)
    ladder = temperature_ladder(4, 2)
    _, betas = ladder_betas(ladder)
    x0 = np.full(4, 5.0)
    xs = jnp.broadcast_to(jnp.asarray(x0, jnp.float32), (2, 16, 4))
    ll0 = jax.vmap(jax.vmap(model.lnlikefn))(xs)
    lp0 = jax.vmap(jax.vmap(model.lnpriorfn))(xs)
    state = init_state(cfg, jax.random.key(3), x0, np.eye(4) * 0.5, betas, ll0, lp0)
    state, out = run_block(state, 60)
    assert np.isfinite(np.asarray(out.x)).all()
    # HMC branch actually ran and accepted something
    names = cfg.jump_names()
    hmc_i = names.index("HMCJump")
    assert int(np.asarray(state.counters.jump_proposed)[hmc_i].sum()) > 0
    assert int(np.asarray(state.counters.jump_accepted)[hmc_i].sum()) > 0


def test_use_pallas_chees_hmc_raises_on_tpu(monkeypatch):
    """On real TPU hardware the fused ChEES/HMC trajectory kernels crash the
    worker when embedded in the scanned step (three consecutive terminal
    failures, PROFILE_r02/r03/r04.md), so use_pallas=True with those families
    must fail loudly at build time there instead of killing the worker. The
    interpreter path (this CPU suite) stays allowed, and NUTS-only cycles
    keep honoring the legacy opt-in."""
    import dataclasses

    import pytest

    from ptmcmcsampler_tpu.config import JumpSpec, KIND_CHEES, KIND_NUTS, SamplerConfig
    from ptmcmcsampler_tpu.proposals import cycle as cycle_mod

    model = CurvedLikelihood()

    def func_grad(x, beta):
        ll, g = model.lnlikefn_grad(x)
        return beta * ll, beta * g

    cfg = SamplerConfig(
        ndim=2, ntemps=1, nchains=4, groups=((0, 1),),
        jumps=(JumpSpec("C", KIND_CHEES, 5),),
        tskip=10, cov_update=50, burn=50, thin=1, de_size=20,
        use_pallas=True,
    )
    monkeypatch.setattr(cycle_mod.jax, "default_backend", lambda: "tpu")
    with pytest.raises(RuntimeError, match="use_pallas=True with ChEES/HMC"):
        cycle_mod.build_jump_branches(cfg, func_grad=func_grad)

    # NUTS-only cycle: no raise (that kernel is hardware-validated in-step).
    cfg_nuts = dataclasses.replace(cfg, jumps=(JumpSpec("N", KIND_NUTS, 5),))
    cycle_mod.build_jump_branches(cfg_nuts, func_grad=func_grad)
