"""Kernel-cache round trip of the example data generator.

The global driver forwards the synthetic truth once on the host and
caches the f64 kernel (examples/workloads.py forward_with_noise); later
runs must reproduce the data exactly from one matvec, and stale caches
from a different geometry must be rejected (advisor round-2 finding:
a shape-compatible stale cache silently produced wrong observations;
round-3 follow-up: the check must fingerprint the GEOMETRY, not just the
shape, and the metadata file must be per-cache, not per-directory).
"""
import json
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "examples"))

import workloads as W  # noqa: E402


def test_cache_save_and_replay(tmp_path):
    wl = W.uniformgrid()
    cache = str(tmp_path / "k.npy")
    d1, o1 = W.forward_with_noise(wl, kernel_cache=cache)
    assert os.path.exists(cache)
    assert wl["kernel_build_host_s"] > 0
    meta = str(tmp_path / "k.meta.json")
    assert os.path.exists(meta)
    assert json.load(open(meta))["geometry"] == W._geometry_fingerprint(wl)
    d2, o2 = W.forward_with_noise(wl, kernel_cache=cache)
    np.testing.assert_array_equal(d1, d2)
    np.testing.assert_array_equal(o1, o2)


def test_meta_path_is_per_cache_file(tmp_path):
    # two caches in one directory must not clobber each other's metadata
    wl = W.uniformgrid()
    c1 = str(tmp_path / "a.npy")
    c2 = str(tmp_path / "b.npy")
    W.forward_with_noise(wl, kernel_cache=c1)
    W.forward_with_noise(wl, kernel_cache=c2)
    assert os.path.exists(tmp_path / "a.meta.json")
    assert os.path.exists(tmp_path / "b.meta.json")


def test_stale_cache_rejected(tmp_path):
    wl = W.uniformgrid()
    cache = str(tmp_path / "k.npy")
    np.save(cache, np.zeros((7, 7)))
    with pytest.raises(ValueError, match="stale cache"):
        W.forward_with_noise(wl, kernel_cache=cache)


def test_wrong_geometry_rejected(tmp_path):
    # a SHAPE-COMPATIBLE cache built for different obs coordinates must be
    # rejected by the geometry fingerprint
    wl = W.uniformgrid()
    cache = str(tmp_path / "k.npy")
    W.forward_with_noise(wl, kernel_cache=cache)
    wl2 = W.uniformgrid()
    xo, yo, zo = wl2["obs"]
    wl2["obs"] = (xo + 50.0, yo, zo)  # same count, shifted stations
    with pytest.raises(ValueError, match="different geometry"):
        W.forward_with_noise(wl2, kernel_cache=cache)
