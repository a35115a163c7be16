"""vis compat package (reference: vis/)."""
from ...vis import mpl  # noqa: F401
