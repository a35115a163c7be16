"""Parity against the reference's committed real-data artifacts.

The reference repository ships the outputs of its actual South China run
(example/realdata/modeldata/maskindex_SC.txt written by
main_real.py:63-64); reproducing them end-to-end validates the full
spherical + segmented + topography-carving construction chain.
"""
import os

import numpy as np
import pytest

from gravinv3dhmc_tpu import mesher

REF = "/root/reference/example/realdata"


@pytest.mark.skipif(not os.path.isdir(REF), reason="reference data absent")
def test_carvetopo_mask_matches_committed_run():
    lons_t, lats_t, topo = np.loadtxt(
        os.path.join(REF, "data", "topo_12d05d.dat"),
        usecols=[0, 1, 2], unpack=True)
    mesh = mesher.TesseroidMeshSegment(
        (106.5, 118.5, 16, 28, 2000, -60000),
        ([-1000, -2000, -5000], 0.5, 0.5),
        [2000, -5000, -15000, -60000])
    mask = mesh.carvetopo(lons_t, lats_t, topo)
    ref_mask = np.loadtxt(
        os.path.join(REF, "modeldata", "maskindex_SC.txt")).astype(int)
    assert sorted(mask) == sorted(ref_mask.tolist())
    # effective cell count from the committed log: 625 x 10427
    assert mesh.size - len(mask) == 10427
