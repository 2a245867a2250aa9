from .examples import (  # noqa: F401
    CorrelatedGaussian,
    CurvedLikelihood,
    IntervalTransformedGaussian,
)
