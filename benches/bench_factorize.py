"""Numeric-factorization benchmark on an FE-class matrix (3 dofs/node,
27-point stencil — shipsec-like structure): times the native multifrontal
LDL^T (raleigh_tpu/native/mf.cpp) and reports effective GF/s.

Usage: python benches/bench_factorize.py [nx] (default 22 -> n=31944,
nnz=2.36M).  OMP_NUM_THREADS controls the subtree task parallelism.
"""
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                '..'))

import numpy as np
import scipy.sparse as scs


def fe_matrix(nx=22, ny=None, nz=None, dofs=3, seed=0):
    ny = ny or nx
    nz = nz or nx
    n_nodes = nx * ny * nz
    idx = np.arange(n_nodes).reshape(nx, ny, nz)
    rows, cols = [], []
    for dx in (-1, 0, 1):
        for dy in (-1, 0, 1):
            for dz in (-1, 0, 1):
                src = idx[max(0, dx):nx + min(0, dx),
                          max(0, dy):ny + min(0, dy),
                          max(0, dz):nz + min(0, dz)]
                dst = idx[max(0, -dx):nx + min(0, -dx),
                          max(0, -dy):ny + min(0, -dy),
                          max(0, -dz):nz + min(0, -dz)]
                rows.append(src.ravel())
                cols.append(dst.ravel())
    rows = np.concatenate(rows)
    cols = np.concatenate(cols)
    rng = np.random.default_rng(seed)
    r = (rows[:, None] * dofs + np.arange(dofs)[None, :]).ravel()
    r = np.repeat(r, dofs)
    c = np.tile((cols[:, None] * dofs + np.arange(dofs)[None, :]),
                (1, dofs)).ravel()
    v = rng.standard_normal(r.size) * 0.01
    a = scs.coo_matrix((v, (r, c)), shape=(n_nodes * dofs,) * 2).tocsr()
    a = a + a.T
    a = a + scs.diags(np.abs(a).sum(axis=1).A.ravel() + 1.0)
    return a


def main():
    from raleigh_tpu.native.ldlt import SparseLDLT

    nx = int(sys.argv[1]) if len(sys.argv) > 1 else 22
    a = fe_matrix(nx)
    print('n = %d, nnz = %d' % (a.shape[0], a.nnz))
    t0 = time.time()
    s = SparseLDLT(a)
    t1 = time.time()
    s.factorize()
    t2 = time.time()
    # solve throughput with a block of 16 right-hand sides
    rng = np.random.default_rng(1)
    b = rng.standard_normal((16, a.shape[0]))
    t3 = time.time()
    x = s.solve(b)
    t4 = time.time()
    resid = np.abs(a @ x.T - b.T).max()
    print('analyse (AMD-vs-ND ordering competition + symbolic): %.2fs'
          % (t1 - t0))
    print('numeric factorize: %.2fs, factor nnz %d' % (t2 - t1,
                                                       s.factor_nnz))
    print('block solve (16 rhs): %.3fs, resid %.2e' % (t4 - t3, resid))


if __name__ == '__main__':
    main()
