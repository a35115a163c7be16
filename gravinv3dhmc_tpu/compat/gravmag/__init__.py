"""gravmag compat package (reference: gravmag/)."""
from ...ops import prism, tesseroid  # noqa: F401
from . import compressor1D, compressor3D, tesseroidforward  # noqa: F401
