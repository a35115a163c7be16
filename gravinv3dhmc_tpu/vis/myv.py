"""3-D mesh visualization (matplotlib backend).

The reference renders meshes with Mayavi/TVTK (reference: vis/myv.py:182,
335 — mostly commented out at its call sites). Mayavi is unavailable in
modern headless environments, so the same API surface is provided on
matplotlib's 3-D toolkit: ``prisms``/``tesseroids`` draw property-colored
cell boxes; ``figure``/``axes``/``savefig``/``show`` mirror the reference
entry points.
"""
from __future__ import annotations

import numpy as np


def _plt():
    import matplotlib.pyplot as plt
    return plt


def figure(size=None, zdown=True):
    """New 3-D figure; z axis inverted for z-down meshes
    (reference: vis/myv.py:457-487)."""
    plt = _plt()
    fig = plt.figure(figsize=size or (8, 7))
    ax = fig.add_subplot(projection="3d")
    if zdown:
        ax.invert_zaxis()
    return ax


def prisms(mesh_or_cells, prop="density", ax=None, cmap=None, alpha=0.9,
           threshold=None, scale=(1.0, 1.0, 1.0)):
    """Draw prisms colored by a property (reference: vis/myv.py:335-456).

    ``threshold`` hides cells with |value| below it (otherwise dense
    meshes are unreadable); pass 0 to draw everything.
    """
    plt = _plt()
    if cmap is None:
        cmap = plt.cm.jet
    if hasattr(mesh_or_cells, "cell_bounds"):
        cells = mesh_or_cells.cell_bounds(only_active=True)
        values = np.asarray(mesh_or_cells.props.get(prop, np.zeros(len(cells))))
        if values.size == mesh_or_cells.size:
            values = values[mesh_or_cells.active]
    else:
        cells = np.asarray(mesh_or_cells)
        values = np.zeros(len(cells))
    if ax is None:
        ax = figure()
    if threshold is None:
        threshold = 0.05 * np.abs(values).max() if values.size else 0.0
    keep = np.abs(values) >= threshold
    cells = cells[keep]
    values = values[keep]
    if values.size == 0:
        return ax
    norm = plt.Normalize(values.min(), values.max() or 1.0)
    from mpl_toolkits.mplot3d.art3d import Poly3DCollection
    polys = []
    for (x1, x2, y1, y2, z1, z2) in cells:
        v = np.array([[x1, y1, z1], [x2, y1, z1], [x2, y2, z1], [x1, y2, z1],
                      [x1, y1, z2], [x2, y1, z2], [x2, y2, z2], [x1, y2, z2]])
        faces = [[0, 1, 2, 3], [4, 5, 6, 7], [0, 1, 5, 4],
                 [2, 3, 7, 6], [0, 3, 7, 4], [1, 2, 6, 5]]
        polys.extend([v[f] * np.array(scale) for f in faces])
    colors = np.repeat(cmap(norm(values)), 6, axis=0)
    coll = Poly3DCollection(polys, facecolors=colors, alpha=alpha,
                            edgecolor="k", linewidths=0.1)
    ax.add_collection3d(coll)
    allv = cells
    ax.set_xlim(allv[:, 0].min(), allv[:, 1].max())
    ax.set_ylim(allv[:, 2].min(), allv[:, 3].max())
    ax.set_zlim(allv[:, 5].max(), allv[:, 4].min())
    return ax


def tesseroids(mesh_or_cells, prop="density", ax=None, **kwargs):
    """Draw tesseroids in (lon, lat, height) box approximation
    (reference: vis/myv.py:182-334 transforms to Cartesian vertices; the
    box approximation keeps the plot readable without VTK)."""
    return prisms(mesh_or_cells, prop=prop, ax=ax, **kwargs)


def axes(ax, xlabel="x", ylabel="y", zlabel="z"):
    """Label axes (reference: vis/myv.py:457-530)."""
    ax.set_xlabel(xlabel)
    ax.set_ylabel(ylabel)
    ax.set_zlabel(zlabel)
    return ax


def outline(ax=None):
    """No-op compatibility shim (reference: vis/myv.py:531-560)."""
    return ax


def savefig(path, dpi=300):
    _plt().savefig(path, dpi=dpi, bbox_inches="tight")


def show():
    _plt().show()
