"""Inversion engines: HMC/NUTS sampling, CG, bootstrap."""
from .potential import (
    GravMagModule,
    logistic_to_mw,
    mw_to_logistic,
    sensitivity_weighting,
)

__all__ = [
    "GravMagModule", "sensitivity_weighting",
    "logistic_to_mw", "mw_to_logistic",
]
