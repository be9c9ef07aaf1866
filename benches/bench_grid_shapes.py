"""Grid-SHAPE A/B for the Mosaic streaming roofline (VERDICT r4 #6).

Round 4 established that the production ring-window DIA SpMM runs at the
same rate as a PURE COPY through the same Pallas grid pipeline
(~330-380 GB/s in+out), while a plain XLA elementwise copy sustains
~620 GB/s — and that the gap is invariant to tile size, layout and DMA
split.  This experiment varies the remaining axis: the GRID SHAPE and
the pipelining mechanism itself.

Variants (all pure copies of an (m, n) f32 array, marginal-chain timed):

  blockspec   the standard Pallas grid pipeline (BlockSpec in/out),
              one tile per grid step — the round-4 reference
  blockspec4  four output tiles per grid step (fewer, longer steps)
  manual2     ONE grid step; the kernel pipelines all chunks itself with
              manual async DMAs through 2 rotating VMEM buffers
              (emit_pipeline-style double buffering)
  manual4     same with 4 rotating buffers (deeper lookahead)
  hbm2hbm     ONE grid step; direct HBM->HBM chunk DMAs, no VMEM bounce
  xla         jnp copy (the XLA elementwise reference, ~620 GB/s)

Usage: python benches/bench_grid_shapes.py [variant ...]
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

M, TILE, NSTEPS = 32, 32768, 39


def build_blockspec(m, n, tile, per_step=1):
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    T = tile * per_step
    assert n % T == 0
    nsteps = n // T

    def kern(x_ref, y_ref):
        y_ref[...] = x_ref[...] * np.float32(0.99999)

    return pl.pallas_call(
        kern, grid=(nsteps,),
        in_specs=[pl.BlockSpec((m, T), lambda i: (0, i))],
        out_specs=pl.BlockSpec((m, T), lambda i: (0, i)),
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024))


def build_manual(m, n, tile, depth):
    """Single-grid-step kernel: the chunk pipeline is hand-written with
    ``depth`` rotating VMEM buffers — in-DMA chunk k+depth-1 launched
    while chunk k's out-DMA drains; Mosaic's grid pipeline machinery is
    completely bypassed."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    T = tile
    assert n % T == 0
    nsteps = n // T

    def kern(x_hbm, y_hbm, *scratch):
        bufs = scratch[:depth]
        in_sems = scratch[depth]
        out_sems = scratch[depth + 1]

        def in_dma(k, b):
            return pltpu.make_async_copy(
                x_hbm.at[:, pl.ds(k * T, T)], bufs[b],
                in_sems.at[b])

        def out_dma(k, b):
            return pltpu.make_async_copy(
                bufs[b], y_hbm.at[:, pl.ds(k * T, T)], out_sems.at[b])

        # prologue: fill the pipeline
        for k in range(min(depth, nsteps)):
            in_dma(k, k % depth).start()
        for k in range(nsteps):
            b = k % depth
            in_dma(k, b).wait()
            # the scale keeps the chain finite and forces a real VMEM
            # round-trip (a pure DMA forward would skip the compute unit
            # entirely; this mirrors what a compute kernel does)
            bufs[b][...] = bufs[b][...] * np.float32(0.99999)
            out_dma(k, b).start()
            nxt = k + depth
            if nxt < nsteps:
                # the buffer frees once its out-DMA completes
                out_dma(k, b).wait()
                in_dma(nxt, b).start()
        # epilogue: drain the last out-DMAs
        for k in range(max(0, nsteps - depth), nsteps):
            if k + depth >= nsteps:          # not yet waited above
                out_dma(k, k % depth).wait()

    return pl.pallas_call(
        kern, grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.float32),
        scratch_shapes=[pltpu.VMEM((m, T), jnp.float32)] * depth
        + [pltpu.SemaphoreType.DMA((depth,)),
           pltpu.SemaphoreType.DMA((depth,))],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024))


def build_hbm2hbm(m, n, tile):
    """Direct HBM->HBM chunk DMAs from a single grid step: measures the
    raw DMA-engine rate with no VMEM bounce at all (a compute kernel
    cannot take this path — its data must visit VMEM — so this bounds
    what removing the bounce could ever buy)."""
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    T = tile
    nsteps = n // T
    depth = 4

    def kern(x_hbm, y_hbm, sems):
        def dma(k):
            return pltpu.make_async_copy(
                x_hbm.at[:, pl.ds(k * T, T)],
                y_hbm.at[:, pl.ds(k * T, T)], sems.at[k % depth])

        for k in range(min(depth, nsteps)):
            dma(k).start()
        for k in range(nsteps):
            dma(k).wait()
            if k + depth < nsteps:
                dma(k + depth).start()

    return pl.pallas_call(
        kern, grid=(1,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.float32),
        scratch_shapes=[pltpu.SemaphoreType.DMA((depth,))],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=110 * 1024 * 1024))


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax
    from bench import _time_chain_marginal

    m = M
    n = TILE * NSTEPS
    x = jax.random.normal(jax.random.PRNGKey(0), (m, n), jnp.float32)
    builders = {
        'blockspec': lambda: build_blockspec(m, n, TILE),
        'blockspec4': lambda: build_blockspec(m, n, TILE, per_step=4),
        'manual2': lambda: build_manual(m, n, TILE, 2),
        'manual4': lambda: build_manual(m, n, TILE, 4),
        'hbm2hbm': lambda: build_hbm2hbm(m, n, TILE),
        'xla': lambda: jax.jit(lambda v: v * np.float32(0.99999)),
    }
    names = sys.argv[1:] or list(builders)
    gb = 2 * m * n * 4 / 1e9
    for name in names:
        # n must divide 4*TILE for blockspec4: 39 steps -> trim helper
        if name == 'blockspec4' and NSTEPS % 4:
            n4 = TILE * (NSTEPS - NSTEPS % 4)
            x4 = x[:, :n4]
            fn = build_blockspec(m, n4, TILE, per_step=4)
            gb4 = 2 * m * n4 * 4 / 1e9

            def make_chain(reps, fn=fn):
                @jax.jit
                def chain(xx):
                    return lax.fori_loop(0, reps, lambda i, yy: fn(yy), xx)
                return chain
            dt = _time_chain_marginal(make_chain, x4,
                                      reps_lo=50, reps_hi=200)
            print('%-11s %7.1f us  %6.1f GB/s' % (name, dt * 1e6,
                                                  gb4 / dt), flush=True)
            continue
        fn = builders[name]()

        def make_chain(reps, fn=fn):
            @jax.jit
            def chain(xx):
                return lax.fori_loop(0, reps, lambda i, yy: fn(yy), xx)
            return chain
        dt = _time_chain_marginal(make_chain, x, reps_lo=50, reps_hi=200)
        print('%-11s %7.1f us  %6.1f GB/s' % (name, dt * 1e6, gb / dt),
              flush=True)


if __name__ == '__main__':
    main()
