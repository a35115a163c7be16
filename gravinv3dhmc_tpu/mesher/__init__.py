"""Array-backed 3-D meshes (reference: mesher/__init__.py:4)."""
from .geometry import GeometricElement, Prism, Tesseroid
from .mesh import (
    PrismMesh,
    PrismMeshSegment,
    PrismRelief,
    StructuredMesh3D,
    TesseroidMesh,
    TesseroidMeshSegment,
)

__all__ = [
    "GeometricElement", "Prism", "Tesseroid",
    "StructuredMesh3D", "PrismMesh", "TesseroidMesh",
    "PrismMeshSegment", "TesseroidMeshSegment", "PrismRelief",
]
