"""Test configuration.

Tests run on a virtual 8-device CPU mesh so that multi-chip sharding logic
is exercised without TPU hardware. The flags must be set before jax is
imported anywhere.
"""
import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The axon TPU plugin's sitecustomize imports jax at interpreter startup,
# so the env vars above arrive too late; override the live config before
# any backend initialises. Tests always run on the virtual CPU mesh.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO_ROOT not in sys.path:
    sys.path.insert(0, REPO_ROOT)


import pytest  # noqa: E402


@pytest.fixture(scope="session")
def small_module():
    """A tiny uniformgrid GravMagModule: (module, dobs, truth) shared by
    sampler integration tests."""
    import numpy as np
    from gravinv3dhmc_tpu import mesher, utils
    from gravinv3dhmc_tpu.inversion.potential import GravMagModule
    from gravinv3dhmc_tpu.ops import prism

    bounds = (0, 800, 0, 1200, 0, 400)
    spacing = (100, 100, 100)
    mesh = mesher.PrismMesh(bounds, spacing)
    nz, ny, nx = mesh.shape
    rho = np.zeros((nz, ny, nx))
    rho[1:3, 4:8, 3:6] = 1.0
    mesh.addprop("density", rho.ravel())
    xo, yo, zo = utils.regular((0, 800, 0, 1200), (nx, ny), z=0.0)
    gz_true, _ = prism.gz(xo, yo, zo, mesh)
    dobs = utils.contaminate(gz_true, 0.02 * gz_true.max(), seed=3)
    module = GravMagModule(dobs, bounds, spacing, (xo, yo, zo),
                           verbose=False)
    return module, dobs, rho.ravel()


def load_reference_modules():
    """Import the reference implementation (pure-python parts only) for
    parity tests. Returns None if it cannot be imported."""
    import numpy as np

    ref_root = "/root/reference"
    if not os.path.isdir(ref_root):
        return None
    # the reference targets numpy<1.20
    if not hasattr(np, "float"):
        np.float = float  # type: ignore[attr-defined]
    if ref_root not in sys.path:
        sys.path.insert(0, ref_root)
    try:
        import mesher as ref_mesher  # noqa: F401
        import utils as ref_utils  # noqa: F401
        return {"mesher": ref_mesher, "utils": ref_utils}
    except Exception:
        return None
