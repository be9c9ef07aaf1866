"""Sparse shift-invert EVP benchmark vs scipy eigsh (BASELINE configs 1/3).

Usage:
    python benches/bench_sparse_evp.py [n1d] [nev] [matrix.mtx]

With a SuiteSparse .mtx (e.g. shipsec1) this reproduces the reference
README's flagship comparison (BASELINE.md: raleigh 6.9 s vs eigsh 240 s on
shipsec1); without one it runs the lap3d config from lap3d.par.
Prints one JSON line.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                '..'))



def run(n1d=30, nev=10, path=None):
    from raleigh_tpu.interfaces.partial_hevp import partial_hevp
    from raleigh_tpu.examples.laplace import lap3d

    if path:
        from scipy.io import mmread
        A = mmread(path).tocsr()
        name = path.rsplit('/', 1)[-1]
    else:
        A = lap3d(n1d, n1d, n1d, 1.0, 1.01, 1.02)
        name = 'lap3d_%d' % n1d
    np.random.seed(1)
    t0 = time.time()
    lmd, x, status = partial_hevp(A, sigma=0, which=nev, tol=1e-4, verb=-1)
    t_r = time.time() - t0

    from scipy.sparse.linalg import eigsh
    t0 = time.time()
    w = eigsh(A, k=nev, sigma=0, which='LM', return_eigenvectors=False)
    t_e = time.time() - t0
    agree = float(np.abs(np.sort(lmd[:nev]) - np.sort(w)).max()
                  / np.abs(w).max())
    print(json.dumps({
        'metric': 'sparse_evp_time', 'matrix': name, 'n': A.shape[0],
        'nev': nev, 'value': round(t_r, 2), 'unit': 's',
        'eigsh_s': round(t_e, 2), 'agreement': agree,
        'vs_eigsh': round(t_e / t_r, 2), 'status': status,
    }))


if __name__ == '__main__':
    a = sys.argv[1:]
    run(int(a[0]) if a else 30, int(a[1]) if len(a) > 1 else 10,
        a[2] if len(a) > 2 else None)
