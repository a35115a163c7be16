"""Kernel-cache round trip of the example data generator.

The global driver forwards the synthetic truth once on the host and
caches the f64 kernel (examples/workloads.py forward_with_noise); later
runs must reproduce the data exactly from one matvec, and stale caches
from a different geometry must be rejected (advisor round-2 finding:
a shape-compatible stale cache silently produced wrong observations).
"""
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
    meta = str(tmp_path / "global_build_meta.json")
    assert os.path.exists(meta)
    d2, o2 = W.forward_with_noise(wl, kernel_cache=cache)
    np.testing.assert_array_equal(d1, d2)
    np.testing.assert_array_equal(o1, o2)


def test_stale_cache_rejected(tmp_path):
    wl = W.uniformgrid()
    cache = str(tmp_path / "k.npy")
    np.save(cache, np.zeros((7, 7)))
    with pytest.raises(ValueError, match="stale cache"):
        W.forward_with_noise(wl, kernel_cache=cache)


def test_stale_meta_rejected(tmp_path):
    wl = W.uniformgrid()
    cache = str(tmp_path / "k.npy")
    D, M = len(wl["obs"][0]), len(wl["rho"])
    np.save(cache, np.zeros((D, M)))
    import json
    with open(tmp_path / "global_build_meta.json", "w") as f:
        json.dump({"shape": [D + 1, M]}, f)
    with pytest.raises(ValueError, match="metadata shape"):
        W.forward_with_noise(wl, kernel_cache=cache)
