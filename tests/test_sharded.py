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
    assert 1 <= sm.halo <= sm.chunk
    got = np.asarray(sm.matmat_t(x))
    want = a @ x
    assert np.abs(got - want).max() / np.abs(want).max() < 1e-5
