#!/usr/bin/env python
"""40-D interval-transformed Gaussian — the reference's
``examples/gaussian_likelihood.ipynb`` workload: a multivariate normal
restricted to a box via the logit ``intervalTransform`` reparameterization,
sampled with the full jump cycle including the gradient family (NUTS/HMC).

Run: python examples/gaussian_likelihood.py
"""

from pathlib import Path

import numpy as np

from ptmcmcsampler_tpu import PTSampler
from ptmcmcsampler_tpu.models import IntervalTransformedGaussian

ndim = 40
model = IntervalTransformedGaussian(ndim=ndim, pmin=0.0, pmax=10.0)

# Start near the center of the box in the transformed coordinates.
p0 = np.zeros(ndim)
cov = np.eye(ndim) * 0.1

sampler = PTSampler(
    ndim,
    model.lnlikefn,
    model.lnpriorfn,
    np.copy(cov),
    logl_grad=model.lnlikefn_grad,
    logp_grad=model.lnpriorfn_grad,
    outDir=str(Path(__file__).parent / "chains_gaussian"),
    ntemps=4,
    nchains=128,
    seed=0,
)

# Reference notebook: 60k iterations, SCAM/AM/DE + NUTS/HMC (MALA off).
sampler.sample(
    p0, 60000, burn=6000, thin=10,
    SCAMweight=10, AMweight=10, DEweight=10, NUTSweight=10, HMCweight=10,
    MALAweight=0, HMCsteps=50, HMCstepsize=0.1,
)

chain = sampler.chain[1000:]
x = 10.0 / (1.0 + np.exp(-chain)) + 0.0  # back-transform to the box
print("\nposterior mean (box coords):", x.mean(axis=0)[:5], "...")
print("posterior std  (box coords):", x.std(axis=0)[:5], "...")
