"""Sliding-window Pallas DIA SpMM for HBM-resident operands.

The fused XLA DIA kernel (ops/spmm.py) is the production path: at
eigensolver working-set sizes (tens of MB) XLA keeps the operand block
VMEM-resident between chained applies and sustains ~1 TB/s effective.
At HBM-resident sizes (n ~ 1e6+, operand >> VMEM) the fused stencil
re-reads each shifted operand window as a separate pass (~4x x-traffic)
and collapses to ~156 GB/s on a ~656 GB/s-stream device.

These kernels remove the re-reads: x is read from HBM exactly once
through a windowed VMEM stream — each grid step computes one lane-tile
of the output from a (T+H)-lane window, and only T new lanes are DMA'd
per step, overlapped with compute.  The diagonal shifts become static
lane-dim slices of the window.  Two variants share the contract:

  * ``build_dia_window_ring`` (production): two alternating windows,
    each assembled entirely by async DMAs (HBM body + local VMEM halo
    copy); nothing but the multiply-adds is serial per step.
  * ``build_dia_window_slide``: one window slid by a per-step VPU copy
    from a double-buffered staging tile (kept as the reference
    implementation and for A/B measurement).

Measured on a v5e at n = 1.28e6 (lap3d 100x100x128, m = 32, tile 32k):
ring 343 GB/s effective vs slide 331 / tile-ring 338 vs fused XLA
156 GB/s.  Round-4 roofline attribution (STATUS.md): a PURE COPY through
the same Pallas grid pipeline measures ~330-380 GB/s (in+out) across
every tile size (8k..128k), layout (strided row blocks vs contiguous
tile-major) and DMA split (1/2/4 concurrent copies per step) — the
diagonal compute is fully hidden (copy and 7-term stencil time are equal
to 1%), so these kernels SATURATE what a Pallas/Mosaic-pipelined kernel
can stream on this device.  A plain XLA elementwise copy does ~620 GB/s;
that 2x is Mosaic grid-pipeline efficiency, not kernel structure.

Constraints (host-side asserts, so the Mosaic compiler never sees an
invalid kernel): row-vector (m, n) operand layout, n a multiple of 128
(HBM slice widths must be lane-aligned), at least two lane-tiles, and
float32 values.  ``DiaMatrix.matmat_rows_window`` wires it up; callers
outside these constraints stay on the XLA path.

Reference capability: mkl_?csrmm block SpMM
(reference raleigh/algebra/mkl_wrap.py:246-276), re-designed for the
TPU memory system.
"""

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _make_apply(call, val_p):
    """Shared builder epilogue: a jitted runner taking the (padded)
    values as an ARGUMENT (a closure-captured jax.Array would be baked
    into the compiled program as a literal — every matrix a fresh
    remote compile), plus the operand-form hooks superkernels use to
    keep the payload out of THEIR programs too."""
    @jax.jit
    def _run(x, v):
        return call(x, v)

    def apply(x):
        return _run(x, val_p)

    apply.operand_fn = _run
    apply.operand = val_p
    return apply


def build_dia_window_ring(offsets, val, n, m, tile=32768,
                          interpret=False, operand_dtype=jnp.float32):
    """Ring-window variant: two alternating (m, T+H) VMEM windows, each
    assembled entirely by async DMAs — the next window's body streams from
    HBM while its H-lane halo is a local VMEM DMA of the current window's
    tail.  Nothing but the diagonal multiply-adds is serial per grid
    step, unlike the slide variant below whose (m, T) stage->window VMEM
    copy runs on the VPU between compute steps.

    ``operand_dtype=jnp.bfloat16`` streams the operand and result blocks
    at half the bytes while the diagonal values stay f32 and every
    multiply-add accumulates in f32 — round-4 measurements put the
    kernel exactly at the Pallas HBM-streaming roofline, so halving the
    streamed bytes is the one lever left that raises nnz/s (~2x), at
    bf16 iterate precision (opt-in for tolerant workloads).

    Same contract and constraints as ``build_dia_window_slide``.
    """
    offsets = tuple(int(o) for o in offsets)
    noff = len(offsets)
    lo = max(0, -min(offsets))
    hi = max(0, max(offsets))
    halo_lo = -(-lo // 128) * 128
    halo_hi = -(-hi // 128) * 128
    H = halo_lo + halo_hi
    T = -(-max(tile, H) // 128) * 128
    if n % 128:
        raise ValueError('window kernel needs n %% 128 == 0 (got %d)' % n)
    if m % 8 and not interpret:
        # Mosaic rejects HBM row slices not aligned to the (8, 128)
        # tiling; callers fall back to the fused XLA kernel
        raise ValueError('window kernel needs m %% 8 == 0 (got %d)' % m)
    npad = -(-n // T) * T
    nsteps = npad // T
    if nsteps < 2:
        raise ValueError('problem too small for the window kernel; '
                         'use the fused XLA path')
    vp = np.zeros((noff, npad), np.float32)
    vp[:, :n] = np.asarray(val, dtype=np.float32)
    val_p = jnp.asarray(vp)

    # window s covers global lanes [sT - halo_lo, sT + T + halo_hi); the
    # body chunk DMA'd from HBM for it is [sT + halo_hi, sT + halo_hi + T)
    # clipped at n (its first H lanes overlap window s-1's tail, which
    # arrives by local VMEM DMA instead)
    def chunk_range(s):
        g0 = s * T + halo_hi
        return g0, max(0, min(T, n - g0))

    w0 = min(T + halo_hi, n)        # valid width of the initial window

    dt = operand_dtype

    def kern(x_hbm, val_ref, y_ref, wa, wb, sems):
        i = pl.program_id(0)

        def hbm_dma(s, wv, w):
            # a DMA semaphore completes by transfer extent: every wait
            # reconstructs EXACTLY this descriptor shape
            return pltpu.make_async_copy(
                x_hbm.at[:, pl.ds(s * T + halo_hi, wv)],
                w.at[:, pl.ds(H, wv)], sems.at[s % 2])

        def halo_dma(src, dst, s):
            return pltpu.make_async_copy(
                src.at[:, pl.ds(T, H)], dst.at[:, pl.ds(0, H)],
                sems.at[2 + s % 2])

        @pl.when(i == 0)
        def _():
            if w0 < T + halo_hi:
                # short first window: zero it whole (lane-aligned store)
                # before the partial DMA lands
                wa[...] = jnp.zeros((m, T + H), wa.dtype)
            elif halo_lo > 0:
                wa[:, 0:halo_lo] = jnp.zeros((m, halo_lo), wa.dtype)
            cp = pltpu.make_async_copy(
                x_hbm.at[:, pl.ds(0, w0)],
                wa.at[:, pl.ds(halo_lo, w0)], sems.at[4])
            cp.start()
            cp.wait()

        # wait this step's window fills (both DMAs started at step i-1)
        for s in range(1, nsteps):
            wv = chunk_range(s)[1]

            @pl.when(i == s)
            def _(s=s, wv=wv):
                w, other = (wb, wa) if s % 2 else (wa, wb)
                if wv > 0:
                    hbm_dma(s, wv, w).wait()
                if H > 0:
                    halo_dma(other, w, s).wait()

        # launch the fills for window i+1 before computing tile i: the
        # HBM stream and the halo copy both overlap this tile's compute
        for s in range(1, nsteps):
            wv = chunk_range(s)[1]

            @pl.when(i + 1 == s)
            def _(s=s, wv=wv):
                w, other = (wb, wa) if s % 2 else (wa, wb)
                if wv < T:
                    # zero the body before a partial (or empty) DMA lands
                    # so lanes beyond n read as exact zeros
                    w[:, H:H + T] = jnp.zeros((m, T), w.dtype)
                if wv > 0:
                    hbm_dma(s, wv, w).start()
                if H > 0:
                    halo_dma(other, w, s).start()

        def compute(w):
            # f32 accumulation whatever the streamed operand dtype
            acc = val_ref[0][None, :] * w[:, halo_lo + offsets[0]:
                                          halo_lo + offsets[0] + T
                                          ].astype(jnp.float32)
            for k in range(1, noff):
                off = offsets[k]
                acc = acc + val_ref[k][None, :] * w[:, halo_lo + off:
                                                    halo_lo + off + T
                                                    ].astype(jnp.float32)
            y_ref[:, :] = acc.astype(dt)

        @pl.when(i % 2 == 0)
        def _():
            compute(wa)

        @pl.when(i % 2 == 1)
        def _():
            compute(wb)

    call = pl.pallas_call(
        kern,
        grid=(nsteps,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec((noff, T), lambda i: (0, i),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((m, T), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, n), dt),
        scratch_shapes=[pltpu.VMEM((m, T + H), dt),
                        pltpu.VMEM((m, T + H), dt),
                        pltpu.SemaphoreType.DMA((5,))],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )

    return _make_apply(call, val_p)


def build_dia_window_slide(offsets, val, n, m, tile=32768,
                           interpret=False):
    """Compile a (m, n) -> (m, n) DIA SpMM with a sliding VMEM window.

    ``offsets``: static diagonal offsets; ``val``: (noff, n) diagonal
    values (row convention val[k, i] = A[i, i + offsets[k]]).

    n must be a multiple of 128: Mosaic rejects lane-unaligned HBM slice
    widths (verified on v5e), and Pallas bounds-checks slices against the
    logical shape, so the tail cannot borrow the operand's physical tile
    padding either.  Unaligned problems go through
    ``DiaMatrix.window_padded_fn``: the same kernel built at
    ceil(n/128)*128 with zero-padded diagonals, fed logically padded
    operands (one pad/slice amortized over a chained recurrence).
    """
    offsets = tuple(int(o) for o in offsets)
    noff = len(offsets)
    lo = max(0, -min(offsets))
    hi = max(0, max(offsets))
    halo_lo = -(-lo // 128) * 128
    halo_hi = -(-hi // 128) * 128
    H = halo_lo + halo_hi
    T = -(-max(tile, H) // 128) * 128
    if n % 128:
        raise ValueError('window kernel needs n %% 128 == 0 (got %d)' % n)
    if m % 8 and not interpret:
        # Mosaic rejects HBM row slices not aligned to the (8, 128)
        # tiling; callers fall back to the fused XLA kernel
        raise ValueError('window kernel needs m %% 8 == 0 (got %d)' % m)
    npad = -(-n // T) * T
    nsteps = npad // T
    if nsteps < 2:
        raise ValueError('problem too small for the window kernel; '
                         'use the fused XLA path')
    vp = np.zeros((noff, npad), np.float32)
    vp[:, :n] = np.asarray(val, dtype=np.float32)
    val_p = jnp.asarray(vp)

    # the stage for step s (s >= 1) holds x[s*T + halo_hi : +T], clipped
    # at n; clip widths are static per step and lane-aligned by the
    # n % 128 == 0 requirement
    def stage_range(s):
        g0 = s * T + halo_hi
        return g0, max(0, min(T, n - g0))

    w0 = min(T + halo_hi, n)        # valid width of the initial window

    def kern(x_hbm, val_ref, y_ref, xwin, stage, sems):
        i = pl.program_id(0)

        def stage_dma(s, wv, slot):
            # a DMA semaphore completes by transfer extent: every wait
            # below reconstructs EXACTLY this descriptor
            return pltpu.make_async_copy(
                x_hbm.at[:, pl.ds(s * T + halo_hi, wv)],
                stage.at[slot, :, pl.ds(0, wv)], sems.at[slot])

        @pl.when(i == 0)
        def _():
            if w0 < T + halo_hi:
                # short first window: zero it whole (lane-aligned store)
                # before the partial DMA lands
                xwin[...] = jnp.zeros((m, T + H), xwin.dtype)
            else:
                xwin[:, 0:halo_lo] = jnp.zeros((m, halo_lo), xwin.dtype)
            cp = pltpu.make_async_copy(
                x_hbm.at[:, pl.ds(0, w0)],
                xwin.at[:, pl.ds(halo_lo, w0)], sems.at[2])
            cp.start()
            cp.wait()

        @pl.when(i > 0)
        def _():
            # consume the tail staged for this step (started at i-1)
            for s in range(1, nsteps):
                wv = stage_range(s)[1]

                @pl.when(i == s)
                def _(s=s, wv=wv):
                    if wv > 0:
                        stage_dma(s, wv, (s - 1) % 2).wait()
            xwin[:, 0:H] = xwin[:, T:T + H]
            xwin[:, H:H + T] = stage[(i - 1) % 2]

        # prefetch the next step's tail while this tile computes; the
        # staged slot alternates, so the one being written here was
        # consumed at the previous step
        for s in range(1, nsteps):
            wv = stage_range(s)[1]

            @pl.when(i + 1 == s)
            def _(s=s, wv=wv):
                slot = (s - 1) % 2
                if wv < T:
                    # zero the whole tail tile before the partial DMA
                    # lands (the padded-val columns then annihilate the
                    # zeros exactly); a full-tile store keeps every
                    # vector op lane-aligned even for unaligned wv
                    stage[slot] = jnp.zeros((m, T), stage.dtype)
                if wv > 0:
                    stage_dma(s, wv, slot).start()

        acc = val_ref[0][None, :] * xwin[:, halo_lo + offsets[0]:
                                         halo_lo + offsets[0] + T]
        for k in range(1, noff):
            off = offsets[k]
            acc = acc + val_ref[k][None, :] * xwin[:, halo_lo + off:
                                                   halo_lo + off + T]
        y_ref[:, :] = acc

    call = pl.pallas_call(
        kern,
        grid=(nsteps,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec((noff, T), lambda i: (0, i),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((m, T), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.float32),
        scratch_shapes=[pltpu.VMEM((m, T + H), jnp.float32),
                        pltpu.VMEM((2, m, T), jnp.float32),
                        pltpu.SemaphoreType.DMA((3,))],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )

    return _make_apply(call, val_p)


def build_dia_window_tiles(offsets, val, n, m, tile=32768,
                           interpret=False):
    """Tile-ring variant: NO halo copies at all.  A rolling ring of four
    whole (m, T) body tiles lives in VMEM, each DMA'd from HBM exactly
    once; computing output tile i reads tiles i-1, i, i+1, and every
    diagonal offset becomes at most two lane-slices split at the tile
    boundary (the split points are the offsets mod T, lane-aligned for
    aligned offsets).

    Motivation (round-4 A/B): the ring/slide variants carry a
    (halo_lo + halo_hi)-lane halo per window — for far stencil offsets
    (lap3d: ±nx*ny) that is most of a tile, so the per-step local
    VMEM-to-VMEM halo DMA moves almost as many bytes as the HBM body
    stream and serializes against it.  Here the halo disappears; the
    only per-step data movement is the one T-wide HBM read and the
    T-wide output write.

    Constraints: same as the other variants, plus max|offset| <= T.
    """
    offsets = tuple(int(o) for o in offsets)
    noff = len(offsets)
    lo = max(0, -min(offsets))
    hi = max(0, max(offsets))
    T = -(-max(tile, 128) // 128) * 128
    if max(lo, hi) > T:
        raise ValueError('tile-ring kernel needs max|offset| <= tile')
    if n % 128:
        raise ValueError('window kernel needs n %% 128 == 0 (got %d)' % n)
    if m % 8 and not interpret:
        # Mosaic rejects HBM row slices not aligned to the (8, 128)
        # tiling; callers fall back to the fused XLA kernel
        raise ValueError('window kernel needs m %% 8 == 0 (got %d)' % m)
    npad = -(-n // T) * T
    nsteps = npad // T
    if nsteps < 2:
        raise ValueError('problem too small for the window kernel; '
                         'use the fused XLA path')
    vp = np.zeros((noff, npad), np.float32)
    vp[:, :n] = np.asarray(val, dtype=np.float32)
    val_p = jnp.asarray(vp)
    w_last = n - (nsteps - 1) * T          # valid width of the last tile

    def kern(x_hbm, val_ref, y_ref, r0, r1, r2, r3, sems):
        i = pl.program_id(0)
        ring = (r0, r1, r2, r3)   # Mosaic: rank-2 scratch refs only

        def tile_dma(t, slot, w):
            return pltpu.make_async_copy(
                x_hbm.at[:, pl.ds(t * T, w)],
                ring[slot].at[:, pl.ds(0, w)], sems.at[slot])

        def fetch(t, slot):
            """Start the DMA for body tile ``t`` into ``slot`` —
            zero-filling first when the tile is partial or absent."""
            if t >= nsteps:
                ring[slot][...] = jnp.zeros((m, T), jnp.float32)
                return
            if t == nsteps - 1 and w_last < T:
                ring[slot][...] = jnp.zeros((m, T), jnp.float32)
                tile_dma(t, slot, w_last).start()
            else:
                tile_dma(t, slot, T).start()

        def await_tile(t, slot):
            if t >= nsteps:
                return
            if t == nsteps - 1 and w_last < T:
                tile_dma(t, slot, w_last).wait()
            else:
                tile_dma(t, slot, T).wait()

        @pl.when(i == 0)
        def _():
            # slot layout at step 0: tile -1 -> slot 3 (zeros),
            # tile 0 -> slot 0 (awaited now), tiles 1 and 2 -> slots 1, 2
            # (left in flight; awaited at steps 0 and 1)
            ring[3][...] = jnp.zeros((m, T), jnp.float32)
            fetch(0, 0)
            fetch(1, 1)
            fetch(2, 2)
            await_tile(0, 0)

        # wait for tile i+1 (started at step i-1, or at step 0 above)
        for s in range(nsteps):
            @pl.when(i == s)
            def _(s=s):
                if s + 1 < nsteps:
                    await_tile(s + 1, (s + 1) % 4)

        # start tile i+2 into the slot vacated by tile i-2 (compute at
        # step i reads slots (i-1), i, (i+1) mod 4 — never (i+2) mod 4);
        # beyond-the-end tiles zero the slot instead (fetch handles it)
        for s in range(1, nsteps):
            @pl.when(i == s)
            def _(s=s):
                fetch(s + 2, (s + 2) % 4)

        # two-tier compute: lane-ALIGNED offsets read region-sliced
        # sources (regions split at the aligned crossing points, so every
        # slice and every val broadcast is lane-aligned — Mosaic rejects
        # only UNALIGNED (1, w) broadcasts); the few unaligned offsets
        # (e.g. +-1) become full-width lane rotations stitched across the
        # tile boundary by a lane-index select
        unal = [k for k in range(noff) if offsets[k] % 128]
        al = [k for k in range(noff) if offsets[k] % 128 == 0]
        bounds = sorted({0, T}
                        | {-offsets[k] for k in al
                           if -T < offsets[k] < 0}
                        | {T - offsets[k] for k in al
                           if 0 < offsets[k] < T})
        regions = list(zip(bounds[:-1], bounds[1:]))
        lanes = jax.lax.broadcasted_iota(jnp.int32, (m, T), 1)

        def compute(prev, cur, nxt):
            acc = None
            for k in unal:
                off = offsets[k]
                s = (-off) % T          # roll(x, s)[t] = x[(t - s) % T]
                if off > 0:
                    sh = jnp.where(lanes < T - off,
                                   pltpu.roll(cur, s, 1),
                                   pltpu.roll(nxt, s, 1))
                else:
                    sh = jnp.where(lanes >= -off,
                                   pltpu.roll(cur, s, 1),
                                   pltpu.roll(prev, s, 1))
                term = val_ref[k][None, :] * sh
                acc = term if acc is None else acc + term
            for rlo, rhi in regions:
                wreg = rhi - rlo
                acc_r = None if acc is None else acc[:, rlo:rhi]
                for k in al:
                    off = offsets[k]
                    lo2 = rlo + off
                    if lo2 < 0:
                        src, s0 = prev, lo2 + T
                    elif lo2 >= T:
                        src, s0 = nxt, lo2 - T
                    else:
                        src, s0 = cur, lo2
                    term = val_ref[k][None, :][:, rlo:rhi] * \
                        src[:, s0:s0 + wreg]
                    acc_r = term if acc_r is None else acc_r + term
                y_ref[:, rlo:rhi] = acc_r

        for r in range(4):
            @pl.when(i % 4 == r)
            def _(r=r):
                compute(ring[(r - 1) % 4][...], ring[r][...],
                        ring[(r + 1) % 4][...])

    call = pl.pallas_call(
        kern,
        grid=(nsteps,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec((noff, T), lambda i: (0, i),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((m, T), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.float32),
        scratch_shapes=[pltpu.VMEM((m, T), jnp.float32),
                        pltpu.VMEM((m, T), jnp.float32),
                        pltpu.VMEM((m, T), jnp.float32),
                        pltpu.VMEM((m, T), jnp.float32),
                        pltpu.SemaphoreType.DMA((4,))],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )

    return _make_apply(call, val_p)


def build_dia_window_ring_ext(offsets, n, m, tile=32768, interpret=False):
    """Ring-window DIA SpMM over a PRE-EXTENDED operand — the per-shard
    kernel of the mesh-partitioned SpMM (ops/spmm.py
    ``DiaMatrix.matmat_rows_sharded``).

    The caller supplies x_ext (m, npad + H) = [left halo (halo_lo) |
    local lanes (n, zero-padded to npad) | right halo + pad], assembled
    from its own shard plus ``ppermute``-exchanged neighbor lanes, and
    the diagonal values (noff, npad) as a TRACED argument (each shard
    holds different values — unlike the single-device builder, nothing
    closes over them).  Pre-extension makes every step's body chunk a
    full, lane-aligned T-wide slice, so this variant has no zero-fill or
    clipped-DMA cases at all.

    Returns (apply(x_ext, val_padded) -> (m, npad), halo_lo, halo_hi,
    npad); callers slice [:, :n].
    """
    offsets = tuple(int(o) for o in offsets)
    noff = len(offsets)
    lo = max(0, -min(offsets))
    hi = max(0, max(offsets))
    halo_lo = -(-lo // 128) * 128
    halo_hi = -(-hi // 128) * 128
    H = halo_lo + halo_hi
    T = -(-max(tile, H) // 128) * 128
    if n % 128:
        raise ValueError('window kernel needs n %% 128 == 0 (got %d)' % n)
    if m % 8 and not interpret:
        # Mosaic rejects HBM row slices not aligned to the (8, 128)
        # tiling; callers fall back to the fused XLA kernel
        raise ValueError('window kernel needs m %% 8 == 0 (got %d)' % m)
    npad = -(-n // T) * T
    nsteps = npad // T
    if nsteps < 2:
        raise ValueError('problem too small for the window kernel; '
                         'use the fused XLA path')

    def kern(x_hbm, val_ref, y_ref, wa, wb, sems):
        i = pl.program_id(0)

        # every chunk is full T width here, so DMA descriptors can take
        # the (traced) window index directly — no per-step unrolling;
        # a wait reconstructs exactly the descriptor its start used
        def body_dma(s, w):
            return pltpu.make_async_copy(
                x_hbm.at[:, pl.ds(s * T + H, T)],
                w.at[:, pl.ds(H, T)], sems.at[s % 2])

        def halo_dma(src, dst, s):
            return pltpu.make_async_copy(
                src.at[:, pl.ds(T, H)], dst.at[:, pl.ds(0, H)],
                sems.at[2 + s % 2])

        @pl.when(i == 0)
        def _():
            cp = pltpu.make_async_copy(
                x_hbm.at[:, pl.ds(0, T + H)],
                wa.at[:, pl.ds(0, T + H)], sems.at[4])
            cp.start()
            cp.wait()

        @pl.when((i > 0) & (i % 2 == 1))
        def _():
            if H > 0:
                halo_dma(wa, wb, i).wait()
            body_dma(i, wb).wait()

        @pl.when((i > 0) & (i % 2 == 0))
        def _():
            if H > 0:
                halo_dma(wb, wa, i).wait()
            body_dma(i, wa).wait()

        # launch window i+1's fills before computing tile i, so the HBM
        # stream and the halo copy overlap this tile's compute
        @pl.when((i + 1 < nsteps) & ((i + 1) % 2 == 1))
        def _():
            if H > 0:
                halo_dma(wa, wb, i + 1).start()
            body_dma(i + 1, wb).start()

        @pl.when((i + 1 < nsteps) & ((i + 1) % 2 == 0))
        def _():
            if H > 0:
                halo_dma(wb, wa, i + 1).start()
            body_dma(i + 1, wa).start()

        def compute(w):
            acc = val_ref[0][None, :] * w[:, halo_lo + offsets[0]:
                                          halo_lo + offsets[0] + T]
            for k in range(1, noff):
                off = offsets[k]
                acc = acc + val_ref[k][None, :] * w[:, halo_lo + off:
                                                    halo_lo + off + T]
            y_ref[:, :] = acc

        @pl.when(i % 2 == 0)
        def _():
            compute(wa)

        @pl.when(i % 2 == 1)
        def _():
            compute(wb)

    call = pl.pallas_call(
        kern,
        grid=(nsteps,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec((noff, T), lambda i: (0, i),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((m, T), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m, npad), jnp.float32),
        scratch_shapes=[pltpu.VMEM((m, T + H), jnp.float32),
                        pltpu.VMEM((m, T + H), jnp.float32),
                        pltpu.SemaphoreType.DMA((5,))],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )

    return call, halo_lo, halo_hi, npad


# production alias consumed by DiaMatrix.matmat_rows_window /
# window_padded_fn; both variants share its contract
build_dia_window_matmat = build_dia_window_ring
