#!/usr/bin/env python
"""50-D hierarchical Gaussian with a weighted jump cycle mixing SCAM/AM/DE,
a custom Gaussian jump, and a prior-draw (independence) jump — BASELINE.json
config 4. The posterior is linear-Gaussian, so the script checks the sampled
moments against the closed form.

Run: python examples/hierarchical_gaussian.py
"""

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from ptmcmcsampler_tpu import PTSampler
from ptmcmcsampler_tpu.models import HierarchicalGaussian

model = HierarchicalGaussian()  # mu + 49 group effects
ndim = model.ndim

sampler = PTSampler(
    ndim,
    model.lnlikefn,
    model.lnpriorfn,
    np.eye(ndim) * 0.05,
    outDir=str(Path(__file__).parent / "chains_hierarchical"),
    ntemps=2,
    nchains=128,
    seed=42,
)


def small_gauss_jump(key, x, it, beta):
    """Custom jump, JAX-native protocol (key, x, iter, beta) -> (q, lqxy)."""
    return x + 0.05 * jax.random.normal(key, x.shape, x.dtype), jnp.zeros(())


sampler.addProposalToCycle(small_gauss_jump, 5, name="SmallGauss")
sampler.addPriorDrawToCycle(model.draw_prior, 2)

niter = 20000
sampler.sample(
    np.zeros(ndim), niter, burn=2000, thin=2, isave=2000, covUpdate=500,
    SCAMweight=20, AMweight=20, DEweight=20,
    NUTSweight=0, HMCweight=0, MALAweight=0, Tskip=100,
)

mean, cov = model.posterior_moments()
post = sampler.chains[:, 2000 // 2 :, :].reshape(-1, ndim)
err = np.abs(post.mean(axis=0) - mean) / np.sqrt(np.diag(cov))
print("\nmax |mean error| / posterior sd:", float(err.max()))
print("sd ratio (sampled/analytic):",
      float((post.std(axis=0) / np.sqrt(np.diag(cov))).mean()))
