"""Visualization: matplotlib grid/mesh plotting."""
from . import mpl

__all__ = ["mpl"]
