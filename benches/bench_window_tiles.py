"""Tile-size sweep for the sliding-window Pallas DIA SpMM
(ops/spmm_window.py) at an HBM-resident size, marginal-chain
methodology (bench._time_chain_marginal — imported, not duplicated).

Usage: python benches/bench_window_tiles.py [ring|slide|tiles] [tile ...]
Prints effective GB/s per tile size (bytes = val + operand-in +
result-out per apply) plus the fused-XLA reference point.  An invalid
tile (e.g. tile >= n) raises instead of silently timing the fallback.
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax
    from bench import _time_chain_marginal
    from raleigh_tpu.examples.laplace import lap3d
    from raleigh_tpu.ops.spmm import DiaMatrix, _dia_matmat_rows
    from raleigh_tpu.ops.spmm_window import (build_dia_window_matmat,
                                             build_dia_window_ring,
                                             build_dia_window_slide,
                                             build_dia_window_tiles)

    variants = {'ring': build_dia_window_ring,
                'slide': build_dia_window_slide,
                'tiles': build_dia_window_tiles}
    builder = build_dia_window_matmat
    args = sys.argv[1:]
    if args and args[0] in variants:
        builder = variants[args.pop(0)]
    tiles = [int(t) for t in args] or [16384, 32768, 65536]
    m = 32
    a = lap3d(100, 100, 128, 1.0, 1.0, 1.0) * 0.125
    d = DiaMatrix(a)
    n = d.shape[0]
    x = jax.random.normal(jax.random.PRNGKey(1), (m, n), jnp.float32)
    bytes_per = (len(d.offsets) * n + 2 * n * m) * 4

    def marginal(fn):
        def make_chain(reps):
            @jax.jit
            def chain(xx):
                return lax.fori_loop(0, reps, lambda i, yy: fn(yy), xx)
            return chain
        return _time_chain_marginal(make_chain, x, reps_lo=50, reps_hi=200)

    for tile in tiles:
        # direct build: an unsatisfiable tile raises ValueError here
        # instead of being silently replaced by the XLA fallback
        fn = builder(d.offsets, np.asarray(d.val), n, m, tile=tile)
        dt = marginal(fn)
        print('tile %7d: %7.1f us/apply  %6.1f GB/s effective'
              % (tile, dt * 1e6, bytes_per / dt / 1e9), flush=True)

    dt = marginal(lambda xx: _dia_matmat_rows(d.val, xx, d.offsets))
    print('fused XLA  : %7.1f us/apply  %6.1f GB/s effective'
          % (dt * 1e6, bytes_per / dt / 1e9))


if __name__ == '__main__':
    main()
