"""Visualization: matplotlib grid/mesh plotting."""
from . import mpl, myv

__all__ = ["mpl", "myv"]
