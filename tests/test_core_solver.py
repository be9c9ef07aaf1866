"""Core-solver end-to-end tests on the reference's demo problem:
diag(1..n) (std/gen/pro, with/without preconditioning), pinned against the
known spectrum (reference examples/core_solver.py:65-128)."""

import numpy as np
import pytest

from raleigh_tpu.core.solver import (Options, Problem, Solver,
                                     DefaultConvergenceCriteria)
from raleigh_tpu.algebra import dense_numpy, dense_jax

N = 100


def _setup(backend, dt, problem):
    v = backend.Vectors(N, data_type=dt)
    a = np.arange(1, N + 1).astype(dt)
    A = backend.Matrix(np.diag(a))
    if problem == 'std':
        B = None
    else:
        B = backend.Matrix(np.diag(2 * np.ones((N,), dtype=dt)))
    if problem == 'pro':
        evp = Problem(v, A, B, 'pro')
    else:
        evp = Problem(v, A, B)
    return v, evp, a


def _options(vtol=1e-8, verb=-1):
    opt = Options()
    opt.convergence_criteria = DefaultConvergenceCriteria()
    opt.convergence_criteria.set_error_tolerance('eigenvector error', vtol)
    opt.verbosity = verb
    return opt


@pytest.mark.parametrize('backend', [dense_numpy, dense_jax],
                         ids=['numpy', 'jax'])
@pytest.mark.parametrize('problem', ['std', 'gen', 'pro'])
def test_smallest_six(backend, problem):
    dt = np.float64
    v, evp, a = _setup(backend, dt, problem)
    solver = Solver(evp)
    status = solver.solve(v, _options(), which=(6, 0))
    assert status == 0
    assert v.nvec() >= 6
    lmd = np.sort(solver.eigenvalues)[:6]
    if problem == 'std':
        want = np.arange(1, 7, dtype=np.float64)
    elif problem == 'gen':
        want = np.arange(1, 7) / 2.0        # A x = lmd B x, B = 2 I
    else:
        want = np.arange(1, 7) * 2.0        # A B x = lmd x
    assert np.allclose(lmd, want, atol=1e-6)
    assert solver.iteration < 100


def test_largest_and_both_ends():
    dt = np.float64
    v, evp, a = _setup(dense_numpy, dt, 'std')
    solver = Solver(evp)
    status = solver.solve(v, _options(), which=(3, 3))
    assert status == 0
    lmd = np.sort(solver.eigenvalues)
    assert np.allclose(lmd[:3], [1, 2, 3], atol=1e-6)
    assert np.allclose(lmd[-3:], [98, 99, 100], atol=1e-6)


def test_largest_magnitude():
    dt = np.float64
    v, evp, a = _setup(dense_numpy, dt, 'std')
    solver = Solver(evp)
    status = solver.solve(v, _options(), which=4)
    assert status == 0
    lmd = np.sort(solver.eigenvalues)[-4:]
    assert np.allclose(lmd, [97, 98, 99, 100], atol=1e-6)


def test_preconditioned():
    dt = np.float64
    v, evp, a = _setup(dense_numpy, dt, 'std')
    solver = Solver(evp)
    P = dense_numpy.Matrix(np.diag(1.0 / a))
    solver.set_preconditioner(P)
    status = solver.solve(v, _options(), which=(6, 0))
    assert status == 0
    assert np.allclose(np.sort(solver.eigenvalues)[:6],
                       np.arange(1, 7), atol=1e-6)


def test_complex_central_difference():
    n = N
    dt = np.complex128
    d = 1j * np.ones((n - 1,), dtype=dt)
    A = np.diag(d, 1) - np.diag(d, -1)   # Hermitian, spectrum in (-2, 2)
    v = dense_numpy.Vectors(n, data_type=dt)
    evp = Problem(v, dense_numpy.Matrix(A))
    solver = Solver(evp)
    status = solver.solve(v, _options(vtol=1e-6), which=(3, 3))
    assert status == 0
    want = 2 * np.cos(np.arange(1, n + 1) * np.pi / (n + 1))
    want.sort()
    lmd = np.sort(solver.eigenvalues)
    assert np.allclose(lmd[:3], want[:3], atol=1e-5)
    assert np.allclose(lmd[-3:], want[-3:], atol=1e-5)


def test_constraints_warm_restart():
    """Passing previously computed eigenvectors: solver computes further
    pairs (reference core/solver.py:112-114)."""
    dt = np.float64
    v, evp, a = _setup(dense_numpy, dt, 'std')
    solver = Solver(evp)
    assert solver.solve(v, _options(), which=(3, 0)) == 0
    first = np.sort(solver.eigenvalues)
    assert np.allclose(first[:3], [1, 2, 3], atol=1e-6)
    solver2 = Solver(evp)
    assert solver2.solve(v, _options(), which=(3, 0)) == 0
    lmd = np.sort(solver2.eigenvalues)
    assert np.allclose(lmd[:3], [4, 5, 6], atol=1e-5)
    assert v.nvec() >= 6


def test_dense_fallback_small_problem():
    """Block size >= n/2 triggers the dense Rayleigh-Ritz path."""
    dt = np.float64
    n = 10
    v = dense_numpy.Vectors(n, data_type=dt)
    A = dense_numpy.Matrix(np.diag(np.arange(1, n + 1).astype(dt)))
    evp = Problem(v, A)
    solver = Solver(evp)
    opt = _options()
    opt.block_size = 8
    status = solver.solve(v, opt, which=(4, 0))
    assert status == 0
    lmd = np.sort(solver.eigenvalues)[:4]
    assert np.allclose(lmd, [1, 2, 3, 4], atol=1e-8)


def test_status_iteration_limit():
    """Status 1: iteration cap exceeded triggers the dense fallback in
    solve() only when CG returns 1; direct cap returns status 1."""
    dt = np.float64
    v, evp, a = _setup(dense_numpy, dt, 'std')
    solver = Solver(evp)
    opt = _options(vtol=1e-14)
    opt.max_iter = 2
    opt.detect_stagnation = False
    status = solver.solve(v, opt, which=(6, 0))
    assert status == 1


def test_max_quota_dense_fallback():
    """max_quota exceeded: remaining pairs come from the dense RR fallback
    (reference core/solver.py:1296-1298,496-585)."""
    dt = np.float64
    n = 40
    v = dense_numpy.Vectors(n, data_type=dt)
    A = dense_numpy.Matrix(np.diag(np.arange(1, n + 1).astype(dt)))
    solver = Solver(Problem(v, A))
    opt = _options()
    opt.max_quota = 0.2
    status = solver.solve(v, opt, which=(20, 0))
    assert status == 0
    assert v.nvec() >= 20
    lmd = np.sort(solver.eigenvalues)
    assert np.allclose(lmd[:20], np.arange(1, 21), atol=1e-6)


def test_factorization_probe_aborts_on_singular(capsys):
    """partial_hevp aborts with status -1 when the shifted matrix is
    factorized too inaccurately (reference partial_hevp.py:154-160)."""
    import scipy.sparse as scs
    from raleigh_tpu.interfaces.partial_hevp import partial_hevp
    n = 200
    # exactly singular shifted matrix: sigma equals an eigenvalue of a
    # diagonal matrix -> perturbed pivots make the solve error enormous
    a = scs.diags(np.arange(n, dtype=np.float64), format='csr')
    lmd, x, status = partial_hevp(a, sigma=5.0, which=2, tol=1e-6, verb=-1)
    assert status == -1 and lmd is None


def test_stopping_criteria_object():
    """User stopping criteria terminate the iteration (status 0) when
    satisfied (reference core/solver.py:1274-1276)."""
    dt = np.float64
    v, evp, a = _setup(dense_numpy, dt, 'std')
    solver = Solver(evp)

    class StopAfterFour:
        def satisfied(self, s):
            return s.rcon + s.lcon >= 4

    opt = _options()
    opt.stopping_criteria = StopAfterFour()
    status = solver.solve(v, opt, which=(-1, 0))
    assert status == 0
    assert 4 <= v.nvec() <= 16


def test_ritz_quality_restart_f32():
    """In float32 with a tight tolerance the Ritz-quality check must kick
    in (restart) without derailing convergence (reference
    core/solver.py:854-920; detect_stagnation off = stability test mode
    per Options docs)."""
    dt = np.float32
    n = 80
    v = dense_numpy.Vectors(n, data_type=dt)
    a = np.linspace(1.0, 5.0, n).astype(dt)
    A = dense_numpy.Matrix(np.diag(a))
    solver = Solver(Problem(v, A))
    opt = _options(vtol=1e-6)
    opt.detect_stagnation = False
    opt.max_iter = 300
    status = solver.solve(v, opt, which=(4, 0))
    assert status in (0, 1)
    lmd = np.sort(solver.eigenvalues)[:4]
    assert np.allclose(lmd, np.sort(a)[:4], atol=1e-4)


def test_verbose_output(capsys):
    """Verbosity >= 2 prints the per-iterate convergence table
    (reference core/solver.py:1051-1064)."""
    dt = np.float64
    v, evp, a = _setup(dense_numpy, dt, 'std')
    solver = Solver(evp)
    status = solver.solve(v, _options(verb=2), which=(2, 0))
    out = capsys.readouterr().out
    assert status == 0
    assert 'iteration' in out and 'eigenvalue' in out
    assert 'converged' in out
