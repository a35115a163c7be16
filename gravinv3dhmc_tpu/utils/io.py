"""Surfer ASCII grid IO (reference: utils.py:25-99)."""
from __future__ import annotations

import dataclasses

import numpy as np


@dataclasses.dataclass
class GridData:
    """Container mirroring the reference's ``gmdata``."""

    data: np.ndarray
    datamin: float
    datamax: float
    ncol: int
    nrow: int
    dx: float
    dy: float
    xmin: float
    xmax: float
    ymin: float
    ymax: float


# Reference-compatible alias
gmdata = GridData


def grdload(filename):
    """Read a Surfer ASCII ``DSAA`` grid file."""
    with open(filename, "r") as f:
        lines = f.readlines()
    if lines[0].strip() != "DSAA":
        raise ValueError(
            f"{filename} is not a Surfer ASCII grd file (missing DSAA header)"
        )
    ncol, nrow = (int(v) for v in lines[1].split())
    xmin, xmax = (float(v) for v in lines[2].split())
    ymin, ymax = (float(v) for v in lines[3].split())
    datamin, datamax = (float(v) for v in lines[4].split())
    data = np.loadtxt(filename, skiprows=5)
    dx = (xmax - xmin) / (ncol - 1)
    dy = (ymax - ymin) / (nrow - 1)
    return GridData(data, datamin, datamax, ncol, nrow, dx, dy, xmin, xmax, ymin, ymax)


def grdwrite(x, y, griddata, filename):
    """Write a Surfer ASCII ``DSAA`` grid file."""
    griddata = np.asarray(griddata)
    with open(filename, "w") as f:
        f.write("DSAA\n")
        f.write(f"{griddata.shape[1]} {griddata.shape[0]}\n")
        f.write(f"{np.min(x):.7f} {np.max(x):.7f}\n")
        f.write(f"{np.min(y):.7f} {np.max(y):.7f}\n")
        f.write(f"{np.min(griddata):.7f} {np.max(griddata):.7f}\n")
        np.savetxt(f, griddata)
