"""NUTS trajectory-capture tests (reference Trajectory buffer and
trajectoryDir dumps, nutsjump.py:294-376, :818-835)."""

import glob
import os

import jax
import jax.numpy as jnp
import numpy as np

from ptmcmcsampler_tpu import PTSampler
from ptmcmcsampler_tpu.config import KIND_NUTS, JumpSpec, SamplerConfig
from ptmcmcsampler_tpu.kernel import build_step
from ptmcmcsampler_tpu.state import init_state
from ptmcmcsampler_tpu.trajectory import Trajectory, capture_to_trajectory


def gaussian(ndim):
    def logl(x):
        return -0.5 * jnp.sum(x**2)

    def logp(x):
        return jnp.where(jnp.all(jnp.abs(x) < 20.0), 0.0, -jnp.inf)

    def func_grad(x, beta):
        return beta * (-0.5 * jnp.sum(x**2)), beta * (-x)

    return logl, logp, func_grad


class TestTrajectoryBuffer:
    def test_add_and_get(self):
        tr = Trajectory(2, bufsize=4)
        tr.add_sample(np.array([0.0, 0.0]), 0, "plus")
        for i in range(1, 6):  # force a buffer grow
            tr.add_sample(np.array([i, 0.0]), i, "plus")
        tr.add_sample(np.array([-1.0, 0.0]), 6, "minus")
        assert tr.length() == 7
        plus, ip = tr.get_trajectory("plus")
        assert plus.shape == (6, 2) and ip[-1] == 5
        both, _ = tr.get_trajectory("both")
        assert both.shape == (7, 2)
        used = tr.get_used_trajectory(3)
        assert used.shape == (4, 2)  # rows 0..3 on the plus branch
        used_m = tr.get_used_trajectory(6)
        # start sample + minus path
        assert used_m.shape == (2, 2)

    def test_used_missing_index_raises(self):
        tr = Trajectory(1)
        tr.add_sample(np.zeros(1), 0, "plus")
        try:
            tr.get_used_trajectory(99)
        except ValueError:
            pass
        else:
            raise AssertionError("expected ValueError")


class TestKernelCapture:
    def test_capture_matches_sampled_chain(self):
        ndim = 2
        logl, logp, func_grad = gaussian(ndim)
        cfg = SamplerConfig(
            ndim=ndim,
            ntemps=1,
            nchains=2,
            groups=(tuple(range(ndim)),),
            jumps=(JumpSpec("NUTSJUMP", KIND_NUTS, 1),),
            tskip=1000,
            cov_update=1000,
            burn=100,
            thin=1,
            de_size=16,
            nuts_max_depth=6,
            nuts_trajectory=True,
        )
        step, _ = build_step(cfg, logl, logp, func_grad)
        x0 = np.array([0.3, -0.4])
        xs = jnp.broadcast_to(jnp.asarray(x0, cfg.dtype), (1, 2, ndim))
        ll0 = jax.vmap(jax.vmap(logl))(xs)
        lp0 = jax.vmap(jax.vmap(logp))(xs)
        state = init_state(cfg, jax.random.PRNGKey(3), x0, np.eye(ndim), np.array([1.0]), ll0, lp0)
        state = jax.jit(step)(state)
        tr = jax.device_get(state.traj)
        assert bool(tr.active)
        lp_, lm_ = int(tr.len_plus), int(tr.len_minus)
        assert lp_ >= 1  # start sample always on the plus buffer
        assert lp_ + lm_ >= 2  # at least one leapfrog leaf
        # Start sample is recorded with global index 0.
        assert int(tr.ind_plus[0]) == 0
        # Used index must be a recorded global index.
        inds = set(np.asarray(tr.ind_plus[:lp_]).tolist()) | set(
            np.asarray(tr.ind_minus[:lm_]).tolist()
        )
        assert int(tr.used_ind) in inds
        # Host-side reconstruction and used-path lookup must work.
        host = capture_to_trajectory(
            dict(
                plus=tr.plus, minus=tr.minus, ind_plus=tr.ind_plus,
                ind_minus=tr.ind_minus, len_plus=tr.len_plus,
                len_minus=tr.len_minus,
            ),
            ndim,
        )
        used = host.get_used_trajectory(int(tr.used_ind))
        assert used.ndim == 2 and used.shape[1] == ndim
        assert np.isfinite(used).all()

    def test_e2e_trajectory_dir(self, tmp_path):
        ndim = 2
        logl, logp, func_grad = gaussian(ndim)

        def logl_grad(x):
            return -0.5 * np.sum(np.asarray(x) ** 2), -np.asarray(x)

        def logp_grad(x):
            return 0.0, np.zeros(ndim)

        outdir = str(tmp_path / "chains")
        trajdir = str(tmp_path / "traj")
        s = PTSampler(
            ndim,
            lambda x: -0.5 * jnp.sum(x**2),
            lambda x: jnp.where(jnp.all(jnp.abs(x) < 20.0), 0.0, -jnp.inf),
            np.eye(ndim),
            logl_grad=lambda x: (-0.5 * jnp.sum(x**2), -x),
            logp_grad=lambda x: (jnp.zeros(()), jnp.zeros(ndim)),
            outDir=outdir,
            verbose=False,
            ntemps=1,
            nchains=2,
            seed=11,
        )
        s.sample(
            np.zeros(ndim), 60, burn=10, thin=1, isave=20, covUpdate=50,
            SCAMweight=0, AMweight=0, DEweight=0, NUTSweight=1, HMCweight=0,
            MALAweight=0, trajectoryDir=trajdir, write_burnin=True,
        )
        files = sorted(glob.glob(os.path.join(trajdir, "*.txt")))
        assert files, "no trajectory files written"
        # Naming parity: burn-in files carry the burnin- prefix.
        assert any(os.path.basename(f).startswith("burnin-") for f in files)
        assert any(
            os.path.basename(f).startswith(("plus-", "minus-", "used-"))
            for f in files
        )
        used = [f for f in files if "used" in os.path.basename(f)]
        arr = np.loadtxt(used[-1], ndmin=2)
        assert arr.shape[1] == ndim and np.isfinite(arr).all()
