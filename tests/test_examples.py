"""Example-script smoke tests: every L5 demo runs end-to-end on small
problems, and the core-solver doctest pin (reference
examples/core_solver.py:67-70 — "6 converged eigenvalues [1..6]") is
enforced by the suite, mirroring the reference's doctest-regression
strategy (SURVEY §4)."""

import doctest

import numpy as np


def test_core_solver_doctest_pin():
    from raleigh_tpu.examples import core_solver

    results = doctest.testmod(core_solver)
    assert results.attempted >= 1
    assert results.failed == 0


def test_sparse_evp_example():
    from raleigh_tpu.examples import sparse_evp

    _, _, vals = sparse_evp.run(nev=4, sigma=0.0, tol=1e-6,
                                compare_eigsh=False,
                                lap_dims=(10, 10, 10, 1.0, 1.01, 1.02))
    from raleigh_tpu.examples.laplace import lap3d
    import scipy.sparse.linalg as spl
    a = lap3d(10, 10, 10, 1.0, 1.01, 1.02)
    ref = spl.eigsh(a, k=4, sigma=0.0, which='LM')[0]
    got = np.sort(np.asarray(vals).ravel())[:4]
    assert np.allclose(got, np.sort(ref), rtol=1e-6)


def test_truncated_svd_demo():
    from raleigh_tpu.examples import truncated_svd_demo

    truncated_svd_demo.run(m=200, n=120, rank=40, nsv=10, arch='cpu')


def test_pca_demo_modes():
    from raleigh_tpu.examples import pca_demo

    for mode in ('simple', 'tol', 'update', 'incremental'):
        pca_demo.run(mode=mode, m=300, n=200, rank=80, npc=20, arch='cpu')


def test_pca_update_past_full_rank():
    """pca(have=) when the existing basis already spans the feature
    space: the merged basis must be capped at the dimension (the
    mean-shift direction and new components have no out-of-span part),
    not overflow into an overcomplete block."""
    from raleigh_tpu import pca, pca_error

    rng = np.random.RandomState(7)
    A = (rng.standard_normal((300, 200))
         @ np.diag(np.arange(1, 201.0) ** -0.7)
         @ rng.standard_normal((200, 200)))
    mean, trans, comps = pca(A[:240], tol=0.05)
    mean, trans, comps = pca(A[240:], have=(mean, trans, comps), tol=0.05)
    assert comps.shape[0] <= 200
    _, ef = pca_error(A, mean, trans, comps)
    assert ef < 0.06
    g = comps @ comps.conj().T
    assert np.abs(g - np.eye(len(g))).max() < 1e-8
