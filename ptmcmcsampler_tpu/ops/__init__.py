"""Pallas TPU kernels for the sampler's hot ops.

The reference has no native/kernel layer at all (SURVEY.md §2: pure Python +
NumPy); here the per-trajectory inner loops — the dominant per-iteration cost
of the gradient jump family — are fused into single Pallas kernels that keep
the whole replica batch resident in VMEM for the full trajectory, with chains
laid out along the 128-wide lane axis (instead of the wasteful
[chains, ndim<<128] layout XLA would tile).

Every kernel has an XLA fallback (the vmapped per-chain path in
``proposals.gradient``) and runs under the Pallas interpreter off-TPU, so
CPU tests exercise identical code.
"""

from .hmc_pallas import make_hmc_pallas  # noqa: F401
from .nuts_pallas import make_nuts_pallas  # noqa: F401
