"""HamiltonianMC sampler-class behaviors: tunnel-safe modes and the fused
Pallas integration (probe + fallback)."""
import numpy as np
import pytest

import jax.numpy as jnp

from gravinv3dhmc_tpu.inversion import hmc


def _chain(module, dobs, nchains=2):
    M = module.n_active
    chain = hmc.HamiltonianMC(module)
    chain.dt = 0.01
    chain.Lrange = [3, 8]
    chain.Sigma = 0.001
    chain.seed = 7
    chain.RegulFactor = 1.0
    chain.regularization = "MS"
    chain.beta = 0.001
    chain.nchains = nchains
    chain.chunk_size = 8
    chain.verbose = False
    chain.write_files = False
    wdiag = module.wdiag
    chain.low = wdiag * np.zeros(M)
    chain.high = wdiag * np.ones(M)
    chain.initial_model = wdiag * np.full(M, 0.001)
    chain.aprior_model = wdiag * np.full(M, 0.001)
    chain.dobs = dobs
    return chain


def test_device_resident_mode_matches_transfer_mode(small_module):
    """transfer_samples=False must produce the same sampling run (same
    counters, same device buffers) while returning no host arrays."""
    module, dobs, _ = small_module
    a = _chain(module, dobs).sample(32, 0)
    c = _chain(module, dobs)
    c.transfer_samples = False
    b = c.sample(32, 0)
    assert b["samples"] is None and b["misfits"] is None
    assert b["accepted"] == a["accepted"]
    assert b["grad_evals"] == a["grad_evals"]
    np.testing.assert_allclose(np.asarray(b["samples_device"], np.float64),
                               a["samples"], rtol=1e-6, atol=1e-8)
    assert b["ess_per_s_median"] is not None
    # the two ESS implementations agree on the same buffers up to f32/f64
    assert b["ess_per_s_median"] == pytest.approx(
        a["ess_per_s_median"]
        * a["elapsed_s"] / b["elapsed_s"], rel=0.05)


def test_use_fused_falls_back_cleanly_on_cpu(small_module):
    """use_fused on a backend without Mosaic (CPU tests) must not fail —
    the probe falls back to the XLA path and sampling proceeds."""
    module, dobs, _ = small_module
    c = _chain(module, dobs, nchains=2)  # also not a multiple of 32
    c.use_fused = True
    out = c.sample(16, 0)
    assert min(out["accepted"]) >= 16


def test_ess_jax_matches_numpy():
    from gravinv3dhmc_tpu.diagnostics import effective_sample_size, ess_jax

    rng = np.random.RandomState(0)
    x = rng.randn(3, 64, 5)
    # add autocorrelation
    for t in range(1, 64):
        x[:, t] = 0.7 * x[:, t - 1] + 0.3 * x[:, t]
    np.testing.assert_allclose(np.asarray(ess_jax(jnp.asarray(x))),
                               effective_sample_size(x), rtol=1e-6)
