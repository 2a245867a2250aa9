from .examples import (  # noqa: F401
    CorrelatedGaussian,
    CurvedLikelihood,
    HierarchicalGaussian,
    IntervalTransformedGaussian,
)
