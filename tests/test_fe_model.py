"""FE generator tests: element-matrix physics, assembly correctness
against a scipy per-element oracle, determinism, and the solver pipeline
on a small girder (the flagship generator of VERDICT r4 #1)."""

import numpy as np
import pytest
import scipy.sparse as scs

from raleigh_tpu.examples.fe_model import (assemble, buckling_64k,
                                           fe_pencil, girder_mesh,
                                           hex8_matrices)


def test_hex8_element_matrices():
    Ke, Me, Ge = hex8_matrices()
    assert np.allclose(Ke, Ke.T) and np.allclose(Me, Me.T) \
        and np.allclose(Ge, Ge.T)
    wk = np.linalg.eigvalsh(Ke)
    # exactly 6 rigid-body modes (3 translations + 3 rotations), rest > 0
    assert np.sum(np.abs(wk) < 1e-12) == 6
    assert wk[-1] > 0
    # translations are exact null vectors
    for d in range(3):
        t = np.zeros(24)
        t[d::3] = 1.0
        assert np.abs(Ke @ t).max() < 1e-12
    # consistent mass: SPD, total mass = element volume per direction
    wm = np.linalg.eigvalsh(Me)
    assert wm[0] > 0
    assert np.isclose(Me.sum(), 3.0)    # rho * V * 3 dof directions
    # geometric stiffness under compression: negative semidefinite
    wg = np.linalg.eigvalsh(Ge)
    assert wg[-1] < 1e-12 and wg[0] < 0


def test_assembly_matches_per_element_oracle():
    conn, n_nodes = girder_mesh(7, 3, 0.2, seed=3)
    Ke, _, _ = hex8_matrices()
    rng = np.random.RandomState(0)
    scale = np.exp(rng.uniform(-0.5, 0.5, conn.shape[0]))
    A = assemble(conn, n_nodes, Ke, elem_scale=scale)
    # oracle: scipy scatter per element
    n = 3 * n_nodes
    O = scs.lil_matrix((n, n))
    for e in range(conn.shape[0]):
        dofs = (3 * conn[e][:, None] + np.arange(3)[None, :]).ravel()
        O[np.ix_(dofs, dofs)] += scale[e] * Ke
    assert abs(A - O.tocsr()).max() < 1e-12


def test_pencil_properties_and_determinism():
    K, M = fe_pencil(10, 3, 0.15, seed=5, which='km')
    assert abs(K - K.T).max() < 1e-12
    assert abs(M - M.T).max() < 1e-12
    from scipy.sparse.linalg import eigsh
    assert eigsh(K, k=1, which='SA', return_eigenvectors=False,
                 tol=1e-6)[0] > 0                       # grounded SPD
    assert eigsh(M, k=1, which='SA', return_eigenvectors=False,
                 tol=1e-6)[0] > 0
    K2, M2 = fe_pencil(10, 3, 0.15, seed=5, which='km')
    assert (K != K2).nnz == 0
    K3, G = fe_pencil(10, 3, 0.15, seed=5, which='kg')
    assert (K != K3).nnz == 0
    assert eigsh(G, k=1, which='LA', return_eigenvectors=False,
                 tol=1e-6)[0] < 1e-10                   # NSD

    # bsr output equals csr
    Kb = fe_pencil(10, 3, 0.15, seed=5, which='k', bsr=True)
    assert Kb.format == 'bsr' and Kb.blocksize == (3, 3)
    assert abs(Kb.tocsr() - K).max() < 1e-12


def test_small_girder_solver_pipeline():
    """End-to-end on a small girder: shift-invert eigenvalues against a
    scipy oracle, and the buckling pencil returns positive load
    factors."""
    from raleigh_tpu.interfaces.partial_hevp import partial_hevp
    from scipy.sparse.linalg import eigsh

    K, M = fe_pencil(9, 3, 0.1, seed=2, which='km')
    lmd, x, st = partial_hevp(K, sigma=0, which=4, tol=1e-8, verb=-1)
    assert st == 0
    w = eigsh(K, k=4, sigma=0, which='LM', return_eigenvectors=False)
    assert np.allclose(np.sort(lmd[:4]), np.sort(w), rtol=1e-6)

    K2, G = fe_pencil(9, 3, 0.1, seed=2, which='kg')
    lmd, x, st = partial_hevp(K2, B=G, buckling=True, sigma=-50.0,
                              which=2, tol=1e-6, verb=-1)
    assert st >= 0 and len(lmd) >= 2
    assert np.all(np.asarray(lmd[:2]) > 0)     # compressive load factors


def test_buckling_bracket_matches_eigsh_sa():
    """The bench's buckling comparison (bench.py _extra_buckling) pins
    ours against eigsh(mode='buckling', which='SA') at the same sigma:
    in scipy's transformed spectrum nu = lmd/(lmd - sigma), the load
    factors inside our (sigma, 0) bracket are the most NEGATIVE nu —
    'SA', not the 'LA' of the reference's below-sigma examples.  Verify
    the two return the same eigenvalue set on a small girder."""
    from raleigh_tpu.interfaces.partial_hevp import partial_hevp
    from raleigh_tpu.algebra.sparse import SparseSymmetricSolver
    from scipy.sparse.linalg import eigsh

    K, G = fe_pencil(13, 3, 0.1, seed=11, which='kg')
    sigma = -0.05
    s = SparseSymmetricSolver()
    s.analyse(K, sigma, G)
    s.factorize()
    neg = s.inertia()[0]
    assert neg >= 2                       # bracket holds >= 2 modes
    lmd, x, st = partial_hevp(K, B=G, buckling=True, sigma=sigma,
                              which=2, tol=1e-6, verb=-1)
    assert st >= 0
    w = eigsh(K, k=neg, M=G, sigma=sigma, mode='buckling', which='SA',
              return_eigenvectors=False)
    assert np.allclose(np.sort(lmd)[:neg], np.sort(w), rtol=1e-5)


def test_ordering_quality_regression_pin():
    """The round-5 ordering rework (spectral thin-waist multilevel ND +
    salted portfolio) reaches 84.5M exact symbolic factor nnz on the
    standard FE flagship — 22% below the round-4 engine.  Guard the
    quality: a regression past 92M means a separator-machinery change
    broke the basin (the coordinate oracle sits at 81.9M)."""
    from raleigh_tpu.examples.fe_model import shipsec_like
    from raleigh_tpu.native import ldlt

    if not ldlt.native_available():
        pytest.skip('native toolchain unavailable')
    K, _ = shipsec_like()
    perm = ldlt.best_ordering(K)
    fill = ldlt.symbolic_factor_nnz(K, perm)
    assert fill < 92e6, fill
