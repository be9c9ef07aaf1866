"""Solver-level HBM-regime benchmark: Chebyshev-preconditioned LOBPCG
on an HBM-resident stencil (lap3d 100x100x128, n = 1.28e6).

This is the consumer the row-layout LOBPCG conversion was for: the
iteration blocks are (m, n) row-vector arrays, so every SpMM inside the
superkernel — the operator applies and the ``degree`` SpMMs of the fused
Chebyshev recurrence — goes through ``DiaMatrix.matmat_rows``, which at
this size routes to the sliding-window Pallas kernel
(ops/spmm_window.py) instead of the fused XLA kernel whose shifted
re-reads collapse to ~156 GB/s in this regime.

Usage: python benches/bench_lobpcg_hbm.py [k] [degree]
Prints wall time and per-iteration time to the requested tolerance,
and eigenvalue error vs the analytic lap3d spectrum.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    from raleigh_tpu.algebra.sparse import Chebyshev, spectral_bounds
    from raleigh_tpu.core.device_solver import lobpcg
    from raleigh_tpu.examples.laplace import lap3d, lap3d_eigenvalues
    from raleigh_tpu.ops.spmm import DiaMatrix

    k = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    degree = int(sys.argv[2]) if len(sys.argv) > 2 else 12

    nx, ny, nz = 100, 100, 128
    a = lap3d(nx, ny, nz, 1.0, 1.0, 1.0)
    exact = np.sort(lap3d_eigenvalues(nx, ny, nz, 1.0, 1.0, 1.0))[:k]
    lo, hi = spectral_bounds(a)
    dm = DiaMatrix(a)
    ch = Chebyshev(a, hi * 1e-4, hi, degree=degree, arch='tpu')
    print('n = %d, k = %d, chebyshev degree %d'
          % (dm.shape[0], k, degree), flush=True)

    # argument-form preconditioner: payload flows through the superkernel
    # as jit arguments (no matrix literals in the compiled program)
    m = k + max(8, k // 4)
    pre = ch.device_rows_operands(m, dm.shape[0])
    t0 = time.time()
    lam, x, r, it, st = lobpcg(dm, k, precond=pre, block_size=m,
                               tol=1e-4, maxit=200, chunk=8,
                               dtype=np.float32, verb=1)
    dt = time.time() - t0
    err = np.abs(np.sort(lam) - exact).max() / exact[-1]
    print('status %d, %d iterations, %.1f s total (%.0f ms/iter), '
          'eigenvalue err %.2e'
          % (st, it, dt, 1e3 * dt / max(it, 1), err))


if __name__ == '__main__':
    main()
