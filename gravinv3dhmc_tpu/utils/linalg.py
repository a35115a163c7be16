"""Dense-or-sparse dispatching linear algebra helpers.

Reference: utils.py:154-255 (``safe_inverse/safe_solve/safe_dot/
safe_diagonal``) — small wrappers that keep calling code agnostic to
whether an operator is a dense array or a ``scipy.sparse`` matrix. Kept
for API parity; the TPU hot paths use vectors for diagonal operators and
never materialise sparse matrices.
"""
from __future__ import annotations

import numpy as np
import scipy.sparse as sp
import scipy.sparse.linalg as spla


def safe_inverse(matrix):
    """Inverse via the appropriate dense/sparse algorithm."""
    if sp.issparse(matrix):
        return spla.inv(matrix.tocsc())
    return np.linalg.inv(matrix)


def safe_solve(matrix, vector):
    """Solve ``matrix @ x = vector`` (dense or sparse)."""
    if sp.issparse(matrix) or sp.issparse(vector):
        vector = np.asarray(vector.todense()).ravel() \
            if sp.issparse(vector) else np.asarray(vector)
        return spla.spsolve(matrix.tocsr(), vector)
    return np.linalg.solve(matrix, vector)


def safe_dot(a, b):
    """Matrix product honouring sparse operands."""
    if sp.issparse(a) or sp.issparse(b):
        return a @ b
    return np.dot(a, b)


def safe_diagonal(matrix):
    """Main diagonal of a dense or sparse matrix."""
    if sp.issparse(matrix):
        return np.asarray(matrix.diagonal())
    return np.diagonal(matrix).copy()


class SparseList:
    """Immutable dict-backed sparse list (legacy fatiando container,
    reference: utils.py:477-546; unused by the main inversion paths but
    part of the public surface)."""

    def __init__(self, size, elements=None):
        self.size = size
        self.i = 0
        self.elements = dict(elements) if elements else {}

    def __str__(self):
        return str(self.elements)

    def __len__(self):
        return self.size

    def __getitem__(self, index):
        if index < 0:
            index = self.size + index
        if index >= self.size or index < 0:
            raise IndexError(f"index {index} out of range")
        return self.elements.get(index, 0.0)

    def __setitem__(self, key, value):
        if key >= self.size:
            raise IndexError(f"index {key} out of range")
        self.elements[key] = value

    def __iter__(self):
        self.i = 0
        return self

    def __next__(self):
        if self.i == self.size:
            raise StopIteration
        res = self[self.i]
        self.i += 1
        return res
