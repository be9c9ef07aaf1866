"""SpMM throughput benchmark: nnz/s for the ELL, BSR and Pallas device
kernels on Laplacian and synthetic banded matrices.

Usage:
    python benches/bench_spmm.py [n_1d] [block_width] [reps]

Prints one JSON line per (kernel, matrix) pair:
  {"metric": "spmm_nnz_per_s", "kernel": ..., "matrix": ..., "value": ...}

Speed-of-light reference: the ELL kernel is HBM-bandwidth bound — per
nonzero it moves 8 bytes of structure (idx+val) plus the gathered operand
row segment; on a v5e (~800 GB/s) with block width m the bound is roughly
800e9 / (8 + 4*m/reuse) nnz/s.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                '..'))



def run(n1d=48, m=32, reps=20):
    import jax
    from raleigh_tpu.examples.laplace import lap3d
    from raleigh_tpu.ops.spmm import EllMatrix, BsrMatrix
    from raleigh_tpu.ops.spmm_pallas import PallasBsrMatrix

    a = lap3d(n1d, n1d, n1d, 1.0, 1.0, 1.0)
    n = a.shape[0]
    np.random.seed(1)
    xt = np.random.randn(n, m).astype(np.float32)

    kernels = {
        'ell': EllMatrix(a),
        'bsr': BsrMatrix(a, bs=128),
    }
    try:
        if jax.devices()[0].platform not in ('cpu',):
            kernels['pallas_bsr'] = PallasBsrMatrix(a, bs=128)
    except Exception:
        pass

    import jax.numpy as jnp
    xj = jnp.asarray(xt)
    for name, k in kernels.items():
        y = k.matmat_t(xj)
        jax.block_until_ready(y)           # compile + warm
        t0 = time.time()
        for _ in range(reps):
            y = k.matmat_t(xj)
        jax.block_until_ready(y)
        dt = (time.time() - t0) / reps
        print(json.dumps({
            'metric': 'spmm_nnz_per_s',
            'kernel': name,
            'matrix': 'lap3d_%d' % n1d,
            'n': n, 'nnz': k.nnz, 'block_width': m,
            'value': round(k.nnz / dt / 1e9, 3), 'unit': 'Gnnz/s',
        }))


if __name__ == '__main__':
    args = [int(x) for x in sys.argv[1:4]]
    run(*args)
