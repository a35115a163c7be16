"""Matplotlib plotting wrappers for gridded fields and mesh layers.

Re-implements the reference's fatiando-derived helpers
(reference: vis/mpl.py:184-435): ``contour``/``contourf``/``pcolor`` take
the flattened x, y, value vectors produced by :func:`utils.regular` plus
the grid ``shape`` and reshape internally. The Basemap wrappers of the
reference (vis/mpl.py:50-183) are not reproduced — Basemap is dead
upstream; ``projection=`` arguments raise with a pointer to cartopy.
"""
from __future__ import annotations

import numpy as np


def _mpl():
    import matplotlib.pyplot as plt
    return plt


def m2km(axis=None):
    """Re-label the current axes from metres to kilometres
    (reference: vis/mpl.py:184-199)."""
    plt = _mpl()
    if axis is None:
        axis = plt.gca()
    axis.set_xticklabels([f"{0.001 * x:g}" for x in axis.get_xticks()])
    axis.set_yticklabels([f"{0.001 * y:g}" for y in axis.get_yticks()])


def _grid(x, y, v, shape):
    x = np.asarray(x).reshape(shape)
    y = np.asarray(y).reshape(shape)
    v = np.asarray(v).reshape(shape)
    return x, y, v


def contour(x, y, v, shape, levels, interp=False, color="k", label=None,
            clabel=True, style="solid", linewidth=1.0, basemap=None):
    """Contour lines of a flattened regular grid
    (reference: vis/mpl.py:250-310)."""
    if basemap is not None:
        raise NotImplementedError("Basemap is unsupported; use cartopy axes")
    plt = _mpl()
    X, Y, V = _grid(x, y, v, shape)
    kwargs = dict(colors=color, linestyles=style, linewidths=linewidth)
    ct = plt.contour(X, Y, V, levels, **kwargs)
    if clabel:
        ct.clabel(fmt="%g")
    if label is not None:
        ct.collections[0].set_label(label)
    return ct.levels


def contourf(x, y, v, shape, levels, interp=False, cmap=None, basemap=None):
    """Filled contours of a flattened regular grid
    (reference: vis/mpl.py:313-370)."""
    if basemap is not None:
        raise NotImplementedError("Basemap is unsupported; use cartopy axes")
    plt = _mpl()
    if cmap is None:
        cmap = plt.cm.jet
    X, Y, V = _grid(x, y, v, shape)
    ct = plt.contourf(X, Y, V, levels, cmap=cmap)
    return ct.levels


def pcolor(x, y, v, shape, cmap=None, vmin=None, vmax=None, basemap=None):
    """Pseudo-color plot of a flattened regular grid
    (reference: vis/mpl.py:373-435)."""
    if basemap is not None:
        raise NotImplementedError("Basemap is unsupported; use cartopy axes")
    plt = _mpl()
    if cmap is None:
        cmap = plt.cm.jet
    X, Y, V = _grid(x, y, v, shape)
    return plt.pcolormesh(X, Y, V, cmap=cmap, vmin=vmin, vmax=vmax,
                          shading="auto")


def layers(mesh, values, prop_label="density", cmap=None, vmin=None,
           vmax=None, ncols=5, figsize=None, suptitle=None):
    """Plot every depth layer of a mesh model as a panel grid — the
    standard posterior-slice figure of the example plot scripts
    (reference: example/uniformgrid/plot_uniform.py:158-230).

    ``values`` is a flat dense model vector (use
    :func:`utils.carve2rho` first for carved meshes).
    """
    plt = _mpl()
    if cmap is None:
        cmap = plt.cm.jet
    nz, ny, nx = mesh.shape
    v3 = np.asarray(values).reshape(nz, ny, nx)
    nrows = int(np.ceil(nz / ncols))
    fig, axes = plt.subplots(nrows, ncols,
                             figsize=figsize or (2.2 * ncols, 2.2 * nrows),
                             squeeze=False)
    if vmin is None:
        vmin = v3.min()
    if vmax is None:
        vmax = v3.max()
    zs = mesh.get_zs()
    for k in range(nrows * ncols):
        ax = axes[k // ncols][k % ncols]
        if k >= nz:
            ax.axis("off")
            continue
        im = ax.pcolormesh(v3[k].T, cmap=cmap, vmin=vmin, vmax=vmax,
                           shading="auto")
        ax.set_title(f"z {zs[k]:g}..{zs[k + 1]:g}", fontsize=8)
        ax.set_aspect("equal", adjustable="box")
    fig.colorbar(im, ax=axes.ravel().tolist(), label=prop_label)
    if suptitle:
        fig.suptitle(suptitle)
    return fig


def profile(mesh, values, axis="y", index=0, cmap=None, vmin=None,
            vmax=None):
    """Vertical cross-section through a mesh model
    (reference: example/uniformgrid/plot_uniform.py:232-264)."""
    plt = _mpl()
    if cmap is None:
        cmap = plt.cm.jet
    nz, ny, nx = mesh.shape
    v3 = np.asarray(values).reshape(nz, ny, nx)
    fig, ax = plt.subplots()
    if axis == "y":
        sec = v3[:, :, index]
    else:
        sec = v3[:, index, :]
    im = ax.pcolormesh(sec, cmap=cmap, vmin=vmin, vmax=vmax, shading="auto")
    ax.invert_yaxis()
    fig.colorbar(im, ax=ax)
    return fig
