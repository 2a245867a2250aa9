"""Unit tests for the multi-process host-side sampler logic.

These exercise the per-process code paths of ``PTSampler.sample`` without
spawning real processes (the 2-process end-to-end coverage lives in
``test_distributed.py``): the neff stop-vote gating, and the resume-time
reconstruction of the in-RAM all-chain window. Both are round-4 advisor
findings — a non-owner process used to fall into the single-chain tau
fallback with only the 1-row seed (tau=1 => n_eff=it => bogus pod-wide stop,
since the stop flag is OR-reduced), and multi-process resume used to seed the
window with a GLOBAL-width array that later LOCAL-width drain blocks cannot
concatenate with.
"""

import numpy as np
import pytest

from ptmcmcsampler_tpu import PTSampler
from ptmcmcsampler_tpu.io.chainfile import ChainWriter


@pytest.fixture
def sampler(tmp_path):
    import jax.numpy as jnp

    def logl(x):
        return -0.5 * jnp.sum(x**2)

    def logp(x):
        return jnp.where(jnp.all(jnp.abs(x) < 10.0), 0.0, -jnp.inf)

    return PTSampler(
        2, logl, logp, np.eye(2),
        ntemps=1, nchains=4, outDir=str(tmp_path / "out"), verbose=False, seed=0,
    )


class TestNeffVote:
    def _ar1_history(self, rows, nchains, ndim, seed=0):
        rng = np.random.default_rng(seed)
        x = np.zeros((rows, nchains, ndim), np.float32)
        e = rng.normal(size=(rows, nchains, ndim))
        for t in range(1, rows):
            x[t] = 0.6 * x[t - 1] + e[t]
        return x

    def test_non_owner_votes_zero(self, sampler):
        # A multi-process peer that never drained cold-chain history: its
        # _chain_host is just the 1-row seed. Pre-fix this returned it
        # (tau=1.0); it must contribute 0 so it cannot stop the pod.
        sampler._multi = True
        sampler._owns_cold = False
        sampler._chains_host = []
        sampler._chains_host_row0 = 1
        sampler._chain_host = [np.zeros((1, sampler.ndim))]
        assert sampler._neff_value(burn_rows=10, it=5000) == 0.0

    def test_owner_single_chain_votes_real_estimate(self, sampler):
        sampler._multi = True
        sampler._owns_cold = True
        sampler.nchains = 1
        sampler._chains_host = []
        sampler._chain_host = [self._ar1_history(512, 1, sampler.ndim)[:, 0, :]]
        n_eff = sampler._neff_value(burn_rows=0, it=512)
        assert 0 < n_eff < 512

    def test_owner_pooled_votes_real_estimate(self, sampler):
        sampler._multi = True
        sampler._owns_cold = True
        sampler._chains_host = [self._ar1_history(256, 4, sampler.ndim)]
        sampler._chains_host_row0 = 1
        sampler._chain_host = [np.zeros((1, sampler.ndim))]
        n_eff = sampler._neff_value(burn_rows=0, it=256)
        assert 0 < n_eff < 4 * 256

    def test_single_process_fallback_unchanged(self, sampler):
        sampler._multi = False
        sampler.nchains = 1
        sampler._chains_host = []
        sampler._chain_host = [self._ar1_history(512, 1, sampler.ndim)[:, 0, :]]
        assert sampler._neff_value(burn_rows=0, it=512) > 0


class TestMultiReloadHostHistory:
    def test_window_restarts_local_width_safe(self, sampler, tmp_path):
        """Multi-process resume: the window must start EMPTY (drains append
        LOCAL-width blocks that cannot concatenate with the global-width
        merge) and row0 must carry the +1 seed-row offset of the part files.
        """
        outdir = str(tmp_path / "w")
        w = ChainWriter(outdir, [1.0])
        total, d = sampler.nchains, sampler.ndim
        # Two part files of 2 chains each, 5 common rows.
        w.reset_all(0, 2, d, cstart=0, nchains_total=total)
        w.reset_all(0, 2, d, cstart=2, nchains_total=total)
        rows = np.arange(5 * total * d, dtype=np.float32).reshape(5, total, d)
        w.append_all(0, rows[:, 0:2], cstart=0, nchains_total=total)
        w.append_all(0, rows[:, 2:4], cstart=2, nchains_total=total)

        sampler._writer = w
        sampler._multi = True
        text = np.zeros((6, d + 4))
        sampler._reload_host_history(text)
        assert sampler._chains_host == []
        # 5 part rows + the seed row that precedes them.
        assert sampler._chains_host_row0 == 6
        # A later local-width drain block appends cleanly (the pre-fix code
        # seeded a [rows, 4, d] global array here and concatenate raised).
        sampler._chains_host.append(np.zeros((3, 2, d), np.float32))
        np.concatenate(sampler._chains_host, axis=0)

    def test_single_process_reload_unchanged(self, sampler, tmp_path):
        outdir = str(tmp_path / "w2")
        w = ChainWriter(outdir, [1.0])
        total, d = sampler.nchains, sampler.ndim
        w.reset_all(0, total, d)
        rows = np.arange(5 * total * d, dtype=np.float32).reshape(5, total, d)
        w.append_all(0, rows)
        sampler._writer = w
        sampler._multi = False
        text = np.zeros((5, d + 4))
        sampler._reload_host_history(text)
        assert len(sampler._chains_host) == 1
        assert sampler._chains_host[0].shape == (5, total, d)
        assert sampler._chains_host_row0 == 0
