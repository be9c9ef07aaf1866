"""Multi-device (virtual 8-CPU mesh) tests: the graft entry points, and the
full core solver running on mesh-sharded block vectors."""

import numpy as np

import jax
from jax.sharding import NamedSharding, PartitionSpec as P


def test_graft_entry_single():
    import __graft_entry__ as g
    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)


def test_graft_dryrun_multichip():
    import __graft_entry__ as g
    g.dryrun_multichip(8)


def test_solver_on_sharded_vectors():
    """The whole block Jacobi-CG iteration over vectors sharded along the
    vector dimension: dot/dots lower to local GEMM + psum, results must
    match the single-device run."""
    from raleigh_tpu.parallel.mesh import make_mesh, blockvec_sharding
    from raleigh_tpu.algebra import dense_jax
    from raleigh_tpu.core.solver import (Options, Problem, Solver,
                                         DefaultConvergenceCriteria)

    n = 96
    mesh = make_mesh(8)
    sh = blockvec_sharding(mesh)

    a = np.arange(1, n + 1).astype(np.float64)
    A = dense_jax.Matrix(np.diag(a), sharding=sh)
    np.random.seed(1)
    v = dense_jax.Vectors(n, data_type=np.float64, sharding=sh)
    evp = Problem(v, A)
    solver = Solver(evp)
    opt = Options()
    opt.convergence_criteria = DefaultConvergenceCriteria()
    opt.convergence_criteria.set_error_tolerance('eigenvector error', 1e-8)
    opt.verbosity = -1
    status = solver.solve(v, opt, which=(4, 0))
    assert status == 0
    lmd = np.sort(solver.eigenvalues)[:4]
    assert np.allclose(lmd, [1, 2, 3, 4], atol=1e-6)
    # eigenvector block stays sharded over the mesh
    assert v.nvec() >= 4


def test_sharded_spmm_matches():
    """Device SpMM with the operand block sharded over the mesh."""
    from raleigh_tpu.parallel.mesh import make_mesh
    from raleigh_tpu.ops.spmm import EllMatrix
    from raleigh_tpu.examples.laplace import lap2d

    a = lap2d(16, 16, 1.0, 1.0)
    n = a.shape[0]
    np.random.seed(1)
    x = np.random.randn(n, 8).astype(np.float32)
    want = a @ x
    mesh = make_mesh(8)
    ell = EllMatrix(a)
    xs = jax.device_put(x, NamedSharding(mesh, P(None, None)))
    got = np.asarray(ell.matmat_t(xs))
    assert np.allclose(got, want, rtol=1e-4, atol=1e-3)


def test_halo_exchange_spmm():
    """Row-partitioned ELL SpMM with RCM + neighbor halo exchange over an
    8-device mesh matches SciPy."""
    from raleigh_tpu.parallel.mesh import make_mesh
    from raleigh_tpu.parallel.spmm_sharded import ShardedEllMatrix
    from raleigh_tpu.examples.laplace import lap3d

    a = lap3d(12, 12, 12, 1.0, 1.0, 1.0)
    n = a.shape[0]
    np.random.seed(1)
    x = np.random.randn(n, 8).astype(np.float32)
    mesh = make_mesh(8)
    sm = ShardedEllMatrix(a, mesh)
    assert sm.chunk == n // 8
    assert sm.mode == 'halo'
    assert 1 <= max(sm.halo) <= sm.chunk
    got = np.asarray(sm.matmat_t(x))
    want = a @ x
    assert np.abs(got - want).max() / np.abs(want).max() < 1e-5


def test_halo_exchange_multihop():
    """A band wider than one chunk per shard: the halo spans multiple
    neighbor chunks (the case that used to raise 'bandwidth exceeds one
    chunk')."""
    import scipy.sparse as scs
    from raleigh_tpu.parallel.mesh import make_mesh
    from raleigh_tpu.parallel.spmm_sharded import ShardedEllMatrix

    from raleigh_tpu.examples.laplace import lap3d
    # lap3d 5^3: n=125 -> chunk 16, RCM bandwidth 49 spans 4 chunks
    a = lap3d(5, 5, 5, 1.0, 1.0, 1.0)
    n = a.shape[0]
    rng = np.random.default_rng(5)
    x = rng.standard_normal((n, 4)).astype(np.float32)
    mesh = make_mesh(8)
    sm = ShardedEllMatrix(a, mesh)
    assert sm.mode == 'halo'
    assert max(sm.halo) > sm.chunk         # genuinely multi-hop
    got = np.asarray(sm.matmat_t(x))
    want = a @ x
    assert np.abs(got - want).max() / np.abs(want).max() < 1e-5


def test_sharded_spmm_gather_fallback():
    """A scattered pattern whose RCM band still spans the whole ring
    falls back to the all-gather regime instead of raising."""
    import scipy.sparse as scs
    from raleigh_tpu.parallel.mesh import make_mesh
    from raleigh_tpu.parallel.spmm_sharded import ShardedEllMatrix

    rng = np.random.default_rng(7)
    n = 400
    a = scs.random(n, n, density=0.02, random_state=3, format='csr')
    a = a + a.T + scs.eye(n)
    x = rng.standard_normal((n, 4)).astype(np.float32)
    mesh = make_mesh(8)
    sm = ShardedEllMatrix(a, mesh)
    assert sm.mode == 'gather'
    got = np.asarray(sm.matmat_t(x))
    want = a @ x
    assert np.abs(got - want).max() / np.abs(want).max() < 1e-4
    # forcing halo mode on this pattern is a clear error
    import pytest
    with pytest.raises(ValueError):
        ShardedEllMatrix(a, mesh, mode='halo')


def test_solver_on_2d_mesh():
    """Full solver over a 2-D (hosts x chips) mesh — the multi-host
    topology of SURVEY §5.8: the vector dimension shards over both axes
    and the Gram psums reduce over the whole grid."""
    from raleigh_tpu.parallel.mesh import make_mesh2d, blockvec_sharding
    from raleigh_tpu.algebra import dense_jax
    from raleigh_tpu.core.solver import (Options, Problem, Solver,
                                         DefaultConvergenceCriteria)

    n = 96
    mesh = make_mesh2d(2, 4)                  # virtual 2 hosts x 4 chips
    assert mesh.devices.shape == (2, 4)
    sh = blockvec_sharding(mesh)
    a = np.arange(1, n + 1).astype(np.float64)
    A = dense_jax.Matrix(np.diag(a), sharding=sh)
    np.random.seed(1)
    v = dense_jax.Vectors(n, data_type=np.float64, sharding=sh)
    opt = Options()
    opt.convergence_criteria = DefaultConvergenceCriteria()
    opt.convergence_criteria.set_error_tolerance('eigenvector error', 1e-8)
    opt.verbosity = -1
    solver = Solver(Problem(v, A))
    status = solver.solve(v, opt, which=(4, 0))
    assert status == 0
    assert np.allclose(np.sort(solver.eigenvalues)[:4], [1, 2, 3, 4],
                       atol=1e-6)


def test_sharded_preconditioned_lobpcg():
    """End-to-end sharded preconditioned eigensolve: DIA operator and
    fused Chebyshev preconditioner partitioned over the 8-device mesh by
    GSPMD, iteration blocks sharded along the vector dimension."""
    from raleigh_tpu.parallel.mesh import make_mesh
    from raleigh_tpu.core.device_solver import lobpcg, shard_operator
    from raleigh_tpu.ops.spmm import device_sparse
    from raleigh_tpu.algebra.sparse import Chebyshev, spectral_bounds
    from raleigh_tpu.examples.laplace import lap3d, lap3d_eigenvalues

    a = lap3d(12, 12, 12, 1.0, 1.0, 1.0)
    exact = np.sort(lap3d_eigenvalues(12, 12, 12, 1.0, 1.0, 1.0))
    lo, hi = spectral_bounds(a)
    mesh = make_mesh(8)
    from raleigh_tpu.parallel.mesh import AXIS
    dm = shard_operator(device_sparse(a, dtype=np.float64), mesh,
                        axis=AXIS)
    # the preconditioner closes over the SAME sharded payload as the
    # operator, so its SpMM routing sees the mesh placement (advisor r3)
    ch = Chebyshev(a, hi * 1e-4, hi, degree=10, device_matrix=dm)
    lam, x, r, it, st = lobpcg(
        dm, 5, precond=ch._device_fused_rows(), tol=1e-8, maxit=300,
        dtype=np.float64,
        sharding=NamedSharding(make_mesh(8), P(AXIS, None)))
    assert st == 0
    assert np.abs(lam - exact[:5]).max() / exact[4] < 1e-6


def test_sharded_dia_never_routes_to_pallas(monkeypatch):
    """A GSPMD-sharded DIA operator must pin the fused XLA kernel whatever
    the working-set size (a bare pallas_call cannot be partitioned) — and
    so must a Chebyshev preconditioner sharing the sharded payload."""
    import jax.numpy as jnp
    from raleigh_tpu.parallel.mesh import make_mesh, AXIS
    from raleigh_tpu.core.device_solver import shard_operator
    from raleigh_tpu.ops.spmm import DiaMatrix
    from raleigh_tpu.algebra.sparse import Chebyshev, spectral_bounds
    from raleigh_tpu.examples.laplace import lap1d

    a = lap1d(1280, 1.0)
    monkeypatch.setattr(DiaMatrix, 'WINDOW_HBM_BYTES', 0)
    mesh = make_mesh(8)
    dm = shard_operator(DiaMatrix(a), mesh, axis=AXIS)
    x = np.random.RandomState(3).randn(4, 1280).astype(np.float32)
    xs = jax.device_put(jnp.asarray(x), NamedSharding(mesh, P(None, AXIS)))
    y = np.asarray(dm.matmat_rows(xs, tile=128))
    ref = (a @ x.T).T
    assert np.abs(y - ref).max() <= 1e-4 * np.abs(ref).max()
    assert dm.window_padded_fn(4, tile=128) is None
    lo, hi = spectral_bounds(a)
    ch = Chebyshev(a, lo, hi, degree=4, device_matrix=dm)
    z = np.asarray(ch._device_fused_rows()(xs))
    assert np.all(np.isfinite(z)) and z.shape == x.shape


def test_sharded_dia_halo_matmat():
    """Mesh-partitioned DIA SpMM: per-shard compute + one-hop ppermute
    halos (with ring wraparound annihilated by the zero out-of-range
    diagonal values) matches scipy, through both per-shard kernels —
    fused XLA and the interpret-mode Pallas ring-window."""
    import jax.numpy as jnp
    import scipy.sparse as scs
    from raleigh_tpu.parallel.mesh import make_mesh, AXIS
    from raleigh_tpu.core.device_solver import shard_operator
    from raleigh_tpu.ops.spmm import DiaMatrix
    from raleigh_tpu.examples.laplace import lap2d

    n = 8 * 512                                # 8 shards x 512 lanes
    a = lap2d(64, 64, 1.0, 1.0)
    a = scs.csr_matrix(a)[:n, :n]              # 4096 = 64^2 exactly
    mesh = make_mesh(8)
    dm = shard_operator(DiaMatrix(a), mesh, axis=AXIS)
    x = np.random.RandomState(11).randn(4, n).astype(np.float32)
    xs = jax.device_put(jnp.asarray(x), NamedSharding(mesh, P(None, AXIS)))
    ref = (a @ x.T).T

    fn = dm.sharded_rows_fn(4, n, force_window=False)
    assert fn is not None
    y = np.asarray(fn(xs))
    assert np.abs(y - ref).max() <= 1e-4 * np.abs(ref).max()

    # matmat_rows routes multi-device vals through the same path
    y2 = np.asarray(dm.matmat_rows(xs))
    assert np.abs(y2 - ref).max() <= 1e-4 * np.abs(ref).max()

    # Pallas ring-window per shard (interpret mode on the CPU mesh):
    # tile 256 -> 2 window steps per 512-lane shard
    fw = dm.sharded_rows_fn(4, n, tile=256, interpret=True,
                            force_window=True)
    yw = np.asarray(fw(xs))
    assert np.abs(yw - ref).max() <= 1e-4 * np.abs(ref).max()


def test_sharded_dia_halo_in_lobpcg():
    """The sharded LOBPCG superkernel consumes the halo-exchange SpMM
    through matmat_rows (values sharded over the mesh) and still
    converges to the exact spectrum."""
    from raleigh_tpu.parallel.mesh import make_mesh, AXIS
    from raleigh_tpu.core.device_solver import lobpcg, shard_operator
    from raleigh_tpu.ops.spmm import DiaMatrix
    from raleigh_tpu.algebra.sparse import Chebyshev, spectral_bounds
    from raleigh_tpu.examples.laplace import lap1d

    n = 8 * 256
    a = lap1d(n, 1.0)
    lo, hi = spectral_bounds(a)
    mesh = make_mesh(8)
    dm = shard_operator(DiaMatrix(a, dtype=np.float64), mesh, axis=AXIS)
    # Chebyshev shares the sharded payload, so the preconditioner's SpMMs
    # also run the halo-exchange path inside the superkernel
    ch = Chebyshev(a, lo, hi, degree=16, device_matrix=dm)
    exact = 4.0 * (n + 1) ** 2 * \
        np.sin(np.arange(1, 6) * np.pi / (2 * (n + 1))) ** 2
    lam, x, r, it, st = lobpcg(
        dm, 5, precond=ch._device_fused_rows(), tol=1e-9, maxit=400,
        dtype=np.float64,
        sharding=NamedSharding(make_mesh(8), P(AXIS, None)))
    assert st == 0
    assert np.abs(lam - exact).max() / exact[-1] < 1e-6


def test_subspace_pca_sharded_matches_single():
    """The one-round-trip PCA engine under GSPMD: with the data matrix
    feature-sharded over the 8-device mesh, the centered-Gram contraction
    lowers to local GEMM + psum and the factors match the single-device
    run to rounding."""
    from raleigh_tpu.parallel.mesh import make_mesh, AXIS
    from raleigh_tpu.interfaces.randomized import subspace_pca

    rng = np.random.RandomState(0)
    m, n, npc = 96, 512, 8
    a = (rng.standard_normal((m, 32)) @ rng.standard_normal((32, n))
         + 0.01 * rng.standard_normal((m, n))).astype(np.float32)
    mean1, trans1, comps1 = subspace_pca(a, npc)
    mesh = make_mesh(8)
    a_sh = jax.device_put(a, NamedSharding(mesh, P(None, AXIS)))
    mean2, trans2, comps2 = subspace_pca(a_sh, npc)
    assert np.abs(mean2 - mean1).max() < 1e-4
    # compare reconstructions (component signs are arbitrary)
    r1 = trans1 @ comps1
    r2 = trans2 @ comps2
    assert np.abs(r1 - r2).max() / np.abs(r1).max() < 1e-3


def test_compensated_dot_sharded():
    """The compensated (double-word) Gram reduction composes with GSPMD
    sharding: chunked exact-product slicing partitions over the mesh and
    still returns f64-class accuracy."""
    from raleigh_tpu.parallel.mesh import make_mesh, blockvec_sharding
    from raleigh_tpu.algebra import dense_jax

    rng = np.random.RandomState(5)
    m, n = 6, 4096
    a32 = rng.standard_normal((m, n)).astype(np.float32)
    b32 = rng.standard_normal((m, n)).astype(np.float32)
    oracle = b32.astype(np.float64) @ a32.astype(np.float64).T
    sh = blockvec_sharding(make_mesh(8))
    g = dense_jax.Vectors(a32, sharding=sh, compensated=True).dot(
        dense_jax.Vectors(b32, sharding=sh))
    assert g.dtype == np.float64
    assert np.abs(g - oracle).max() / np.abs(oracle).max() < 1e-10
