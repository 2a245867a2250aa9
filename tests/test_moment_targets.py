"""Ground-truth posterior moment targets used by the bench's statistical QA.

The bench (bench.py) asserts sampled means against these targets on the same
run that records the speed number; these tests pin the targets themselves:
grid-refinement stability (quadrature converged) and an independent
Monte-Carlo cross-check where direct sampling is possible.
"""

import numpy as np

from ptmcmcsampler_tpu.models import CurvedLikelihood, IntervalTransformedGaussian


def test_curved_moments_grid_converged():
    m1, c1 = CurvedLikelihood().posterior_moments(n=1201)
    m2, c2 = CurvedLikelihood().posterior_moments(n=2001)
    np.testing.assert_allclose(m1, m2, atol=2e-3)
    np.testing.assert_allclose(c1, c2, atol=5e-3)
    # The target is bimodal: banana ridge near y ~ -1 and a blob at (0, 2).
    # The mean must sit between them and x-symmetry must hold.
    assert abs(m2[0]) < 1e-3  # density is even in x
    assert -1.5 < m2[1] < 2.0
    assert c2[1, 1] > 0.5  # y-variance spans the modes


def test_curved_moments_vs_importance_mc():
    """Independent check: self-normalized importance sampling from a wide
    Gaussian over the support."""
    model = CurvedLikelihood()
    mean_q, _ = model.posterior_moments(n=2001)
    rng = np.random.default_rng(0)
    n = 2_000_000
    # Proposal: mixture covering both modes (importance weights stay bounded
    # because the target's exponents are <= 0 and the proposal is heavier).
    xs = rng.uniform(-6, 6, size=n)
    ys = rng.uniform(-9, 5, size=n)
    e0 = -(xs**2) - (9 + 4 * xs**2 + 9 * ys) ** 2
    e1 = -8 * xs**2 - 8 * (ys - 2) ** 2
    ll = np.logaddexp(e0, np.log(0.5) + e1)
    w = np.exp(ll - ll.max())
    mx = (w * xs).sum() / w.sum()
    my = (w * ys).sum() / w.sum()
    ess = w.sum() ** 2 / (w**2).sum()
    se_x = np.sqrt(((w * (xs - mx) ** 2).sum() / w.sum()) / ess)
    se_y = np.sqrt(((w * (ys - my) ** 2).sum() / w.sum()) / ess)
    assert abs(mx - mean_q[0]) < 6 * se_x + 1e-3
    assert abs(my - mean_q[1]) < 6 * se_y + 1e-3


def test_interval_gaussian_moments_vs_mc():
    model = IntervalTransformedGaussian(ndim=4)
    mean_q, cov_q = model.posterior_moments()
    rng = np.random.default_rng(1)
    draws = rng.normal(size=4_000_000)
    draws = draws[(draws > 0.0) & (draws < 10.0)]  # truncated normal on (0,10)
    p = np.log(draws / (10.0 - draws))
    se = p.std() / np.sqrt(len(p))
    assert abs(p.mean() - mean_q[0]) < 6 * se
    assert abs(p.var() - cov_q[0, 0]) < 0.01
    assert mean_q.shape == (4,)
    np.testing.assert_allclose(mean_q, mean_q[0])


def test_interval_gaussian_grid_converged():
    m1, c1 = IntervalTransformedGaussian(ndim=2).posterior_moments(n=500_001)
    m2, c2 = IntervalTransformedGaussian(ndim=2).posterior_moments(n=2_000_001)
    np.testing.assert_allclose(m1, m2, atol=1e-5)
    # The p^2 integrand's log^2 tail near the box edges converges slower than
    # the mean; 3e-4 is far tighter than the bench's z-test needs.
    np.testing.assert_allclose(c1, c2, atol=3e-4)
