"""Resumed runs report 'percent of new work' in the progress line
(reference PTMCMCSampler.py:358-366)."""

import jax.numpy as jnp
import numpy as np

from ptmcmcsampler_tpu import PTSampler


def _logl(x):
    return -0.5 * jnp.sum(x**2)


def _logp(x):
    return jnp.where(jnp.all(jnp.abs(x) < 10.0), 0.0, -jnp.inf)


def test_resume_progress_line(tmp_path, capsys):
    out = str(tmp_path / "chains")
    s = PTSampler(2, _logl, _logp, np.eye(2), outDir=out, ntemps=2, nchains=4, seed=1)
    s.sample(np.zeros(2), 200, burn=50, thin=1, isave=100,
             SCAMweight=20, AMweight=20, DEweight=20)
    first = capsys.readouterr().out
    assert "percent of new work" not in first

    s2 = PTSampler(2, _logl, _logp, np.eye(2), outDir=out, ntemps=2, nchains=4,
                   seed=1, resume=True)
    s2.sample(np.zeros(2), 400, burn=50, thin=1, isave=100,
              SCAMweight=20, AMweight=20, DEweight=20)
    second = capsys.readouterr().out
    assert "percent of new work" in second
