"""Tile-size sweep for the sliding-window Pallas DIA SpMM
(ops/spmm_window.py) at an HBM-resident size, marginal-chain
methodology (see bench.py._time_chain_marginal).

Usage: python benches/bench_window_tiles.py [tile ...]
Prints effective GB/s per tile size (bytes = val + operand-in +
result-out per apply) plus the fused-XLA reference point.
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax
    from raleigh_tpu.examples.laplace import lap3d
    from raleigh_tpu.ops.spmm import DiaMatrix

    tiles = [int(t) for t in sys.argv[1:]] or [16384, 32768, 65536, 131072]
    m = 32
    a = lap3d(100, 100, 128, 1.0, 1.0, 1.0) * 0.125
    d = DiaMatrix(a)
    n = d.shape[0]
    x = jax.random.normal(jax.random.PRNGKey(1), (m, n), jnp.float32)
    bytes_per = (len(d.offsets) * n + 2 * n * m) * 4

    def marginal(fn, reps_lo=50, reps_hi=200):
        def run(reps):
            @jax.jit
            def chain(xx):
                return lax.fori_loop(0, reps, lambda i, yy: fn(yy), xx)
            np.asarray(chain(x).ravel()[:4])
            t0 = time.time()
            np.asarray(chain(x).ravel()[:4])
            return time.time() - t0
        t_lo, t_hi = run(reps_lo), run(reps_hi)
        return max(t_hi - t_lo, 1e-9) / (reps_hi - reps_lo)

    for tile in tiles:
        d.matmat_rows_window(x, tile=tile)       # build + compile
        fn = d._window_cache[(m, tile, False)]
        dt = marginal(fn)
        print('tile %7d: %7.1f us/apply  %6.1f GB/s effective'
              % (tile, dt * 1e6, bytes_per / dt / 1e9), flush=True)

    from raleigh_tpu.ops.spmm import _dia_matmat_rows
    dt = marginal(lambda xx: _dia_matmat_rows(d.val, xx, d.offsets))
    print('fused XLA  : %7.1f us/apply  %6.1f GB/s effective'
          % (dt * 1e6, bytes_per / dt / 1e9))


if __name__ == '__main__':
    main()
