"""DE pair-selection modes: rolled (shared-shift, gather-free) vs iid.

The rolled mode's guarantee: for EVERY chain c the marginal law of its
buffer-row pair ((c+s1)%n, (c+s2)%n) is uniform over ordered distinct pairs —
identical to the reference's redraw-until-distinct draw
(PTMCMCSampler.py:963-966) — because s -> (c+s)%n is a bijection for fixed c.
These tests verify that marginal law through the actual batch kernel for
several chain indices, and that a full sampling run under rolled pairs is
statistically indistinguishable from iid pairs.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ptmcmcsampler_tpu.config import JumpSpec, KIND_DE, KIND_SCAM, SamplerConfig
from ptmcmcsampler_tpu.kernel import build_step
from ptmcmcsampler_tpu.ladder import ladder_betas, temperature_ladder
from ptmcmcsampler_tpu.proposals.base import ProposalContext
from ptmcmcsampler_tpu.proposals.de import make_de_batch, make_de_blocked
from ptmcmcsampler_tpu.state import init_state
from ptmcmcsampler_tpu import utils


def test_rolled_marginal_pair_law_per_chain():
    nvalid = 4
    nchains = 5
    cfg = SamplerConfig(
        ndim=1, ntemps=1, nchains=nchains, groups=((0,),),
        jumps=(JumpSpec("de", KIND_DE, 1),),
    )
    de_b = make_de_batch(cfg)
    # Distinct row values whose ordered differences are all distinct, so a
    # mode jump (scale=1) uniquely identifies the drawn (row1, row2) pair.
    vals = np.array([0.0, 1.0, 3.0, 9.0], np.float32)
    ctx = ProposalContext(
        group_u=(jnp.eye(1),), group_s=(jnp.ones(1),),
        chol=jnp.eye(1), chol_inv=jnp.eye(1),
        de_buf=jnp.asarray(vals[None, :]),
        de_valid=jnp.asarray(nvalid, jnp.int32),
    )
    n = 30000
    base_keys = jax.random.split(jax.random.key(3), n)
    x = jnp.zeros((1, 1, nchains), jnp.float32)  # [T, D, C]
    betas = jnp.ones((1,), jnp.float32)

    def draw(k):
        keys = utils.split_grid(k, (1, nchains))
        q, _, _ = de_b(keys, x, betas, jnp.asarray(0, jnp.int32), ctx, {})
        return q[0, 0, :]

    deltas = np.asarray(jax.jit(jax.vmap(draw))(base_keys))  # [n, nchains]
    diffs = {}
    for a in range(nvalid):
        for b in range(nvalid):
            if a != b:
                diffs[(a, b)] = vals[a] - vals[b]
    # note: buffer rows 0..3 valid and rows == nvalid here, so the roll path
    # is the one exercised.
    for chain in range(nchains):
        d = deltas[:, chain]
        counts = {p: int(np.sum(np.isclose(d, v, atol=1e-6))) for p, v in diffs.items()}
        total = sum(counts.values())
        assert total > n * 0.35, total  # ~half are mode jumps (scale == 1)
        for p, cnt in counts.items():
            assert abs(cnt / total - 1 / 12) < 0.02, (chain, p, cnt / total)


def test_rolled_partial_buffer_uses_valid_rows_only():
    cfg = SamplerConfig(
        ndim=1, ntemps=1, nchains=3, groups=((0,),),
        jumps=(JumpSpec("de", KIND_DE, 1),),
    )
    de_b = make_de_batch(cfg)
    vals = np.array([0.0, 1.0, 3.0, 100.0, 200.0, 300.0], np.float32)
    ctx = ProposalContext(
        group_u=(jnp.eye(1),), group_s=(jnp.ones(1),),
        chol=jnp.eye(1), chol_inv=jnp.eye(1),
        de_buf=jnp.asarray(vals[None, :]),
        de_valid=jnp.asarray(3, jnp.int32),  # only rows 0..2 are history
    )
    n = 4000
    base_keys = jax.random.split(jax.random.key(5), n)
    x = jnp.zeros((1, 1, 3), jnp.float32)  # [T, D, C]
    betas = jnp.ones((1,), jnp.float32)

    def draw(k):
        keys = utils.split_grid(k, (1, 3))
        q, _, _ = de_b(keys, x, betas, jnp.asarray(0, jnp.int32), ctx, {})
        return q[0, 0, :]

    deltas = np.asarray(jax.jit(jax.vmap(draw))(base_keys))
    # No difference involving the 100/200/300 rows may ever appear. Valid
    # differences are at most 3, scaled by at most 2.4/sqrt(2) on non-mode
    # jumps; a leak of an invalid row would show as |delta| ~ 100.
    assert np.max(np.abs(deltas)) <= 3.0 * 2.4 / np.sqrt(2.0) + 1e-4


@pytest.mark.slow
def test_rolled_vs_iid_statistically_equivalent():
    """Full sampling runs: SCAM+DE cycle on a correlated Gaussian. The
    rolled and iid modes must agree on acceptance rate and posterior
    moments within MC error."""

    def logl(x):
        return -0.5 * (x[0] ** 2 + (x[1] - x[0]) ** 2 + x[1] ** 2)

    def logp(x):
        return jnp.where(jnp.all(jnp.abs(x) < 20.0), 0.0, -jnp.inf)

    results = {}
    for mode in ("blocked", "rolled", "iid"):
        cfg = SamplerConfig(
            ndim=2, ntemps=2, nchains=48, groups=((0, 1),),
            jumps=(
                JumpSpec("scam", KIND_SCAM, 1),
                JumpSpec("de", KIND_DE, 3, activate_after=100),
            ),
            tskip=10, cov_update=200, burn=100, thin=2, de_size=64,
            de_pair=mode,
        )
        step, run_block = build_step(cfg, logl, logp)
        ladder = temperature_ladder(2, 2)
        _, betas = ladder_betas(ladder)
        xs = jnp.zeros((2, 48, 2))
        ll0 = jax.vmap(jax.vmap(logl))(xs)
        lp0 = jax.vmap(jax.vmap(logp))(xs)
        state = init_state(
            cfg, jax.random.key(11), np.zeros(2), np.eye(2), betas, ll0, lp0
        )
        state, _ = run_block(state, 400)  # burn + DE activation
        state0_acc = np.asarray(state.counters.naccepted).copy()
        it0 = int(state.it)
        state, out = run_block(state, 2500)
        acc_rate = (
            np.asarray(state.counters.naccepted) - state0_acc
        ).mean() / (int(state.it) - it0)
        cold = np.moveaxis(np.asarray(out.x[:, 0]), 1, 2).reshape(-1, 2)
        results[mode] = (acc_rate, cold.mean(axis=0), cold.std(axis=0))

    acc_i, mean_i, std_i = results["iid"]
    for mode in ("blocked", "rolled"):
        acc_r, mean_r, std_r = results[mode]
        assert abs(acc_r - acc_i) < 0.05, (mode, acc_r, acc_i)
        np.testing.assert_allclose(std_r, std_i, rtol=0.12, err_msg=mode)
        np.testing.assert_allclose(mean_r, mean_i, atol=0.15, err_msg=mode)


def test_blocked_marginal_pair_law_per_chain():
    """Blocked mode: every chain's pair law is the reference's uniform
    ordered-distinct draw (groups share draws; marginals are exact)."""
    nvalid = 4
    nchains = 6  # 3 groups of 2 at de_block=2
    cfg = SamplerConfig(
        ndim=1, ntemps=1, nchains=nchains, groups=((0,),),
        jumps=(JumpSpec("de", KIND_DE, 1),), de_pair="blocked", de_block=2,
    )
    de_b = make_de_blocked(cfg)
    vals = np.array([0.0, 1.0, 3.0, 9.0], np.float32)
    ctx = ProposalContext(
        group_u=(jnp.eye(1),), group_s=(jnp.ones(1),),
        chol=jnp.eye(1), chol_inv=jnp.eye(1),
        de_buf=jnp.asarray(vals[None, :]),
        de_valid=jnp.asarray(nvalid, jnp.int32),
    )
    n = 30000
    base_keys = jax.random.split(jax.random.key(9), n)
    x = jnp.zeros((1, 1, nchains), jnp.float32)
    betas = jnp.ones((1,), jnp.float32)

    def draw(k):
        keys = utils.split_grid(k, (1, nchains))
        q, _, _ = de_b(keys, x, betas, jnp.asarray(0, jnp.int32), ctx, {})
        return q[0, 0, :]

    deltas = np.asarray(jax.jit(jax.vmap(draw))(base_keys))  # [n, nchains]
    diffs = {}
    for a in range(nvalid):
        for b in range(nvalid):
            if a != b:
                diffs[(a, b)] = vals[a] - vals[b]
    for chain in range(nchains):
        d = deltas[:, chain]
        counts = {p: int(np.sum(np.isclose(d, v, atol=1e-6))) for p, v in diffs.items()}
        total = sum(counts.values())
        assert total > n * 0.35, total
        for p, cnt in counts.items():
            assert abs(cnt / total - 1 / 12) < 0.02, (chain, p, cnt / total)
    # chains within a group share the pair (equal deltas whenever both drew
    # mode jumps, ~P(mode)^2 = 0.25); different groups share only by chance
    # (~0.25/12). Scales are still per-chain, so non-mode deltas differ.
    same_group = np.mean(deltas[:, 0] == deltas[:, 1])
    diff_group = np.mean(deltas[:, 0] == deltas[:, 2])
    assert same_group > 0.2, same_group
    assert diff_group < 0.1, diff_group
