"""Accuracy tests for the device-resident randomized/subspace engines
against exact LAPACK truncation (the engine behind bench.py)."""

import numpy as np

from raleigh_tpu.examples.generate_matrix import generate
from raleigh_tpu.interfaces.pca import pca, pca_error
from raleigh_tpu.interfaces.randomized import randomized_svd


def test_subspace_pca_matches_optimal_truncation():
    np.random.seed(1)
    A, s0, u0, v0 = generate(1200, 800, 400, pca=True)
    mean, trans, comps = pca(A, npc=80, method='subspace')
    assert comps.shape == (80, 800) and trans.shape == (1200, 80)
    em, ef = pca_error(A, mean, trans, comps)
    mu = A.mean(axis=0)
    As = A - mu
    u, s, vt = np.linalg.svd(As, full_matrices=False)
    err = As - (u[:, :80] * s[:80]) @ vt[:80]
    ef_opt = np.linalg.norm(err) / np.linalg.norm(As)
    assert ef <= ef_opt * 1.02
    # components orthonormal
    g = comps @ comps.T
    assert np.abs(g - np.eye(80)).max() < 5e-3


def test_randomized_svd_sigma():
    np.random.seed(1)
    A, s0, u0, v0 = generate(1000, 700, 300)
    u, s, vt = randomized_svd(A, 40)
    assert np.abs(s - s0[:40]).max() / s0[0] < 1e-3
    # A v ~= u s
    av = A @ vt.T
    assert np.abs(av - u * s).max() < 1e-3 * s0[0]
