"""Pallas TPU kernel for block-sparse (BSR) SpMM.

The XLA path in ops/spmm.py (gather + batched einsum + segment_sum)
materializes the gathered operand tiles in HBM; this kernel fuses the whole
pipeline: for every (bs x bs) tile of the sparse matrix the operand tile is
streamed HBM->VMEM by the Pallas pipeline (double-buffered automatically),
contracted on the MXU, and accumulated into the output tile in VMEM — one
pass over the factor data, no intermediate cube.

Layout: tiles of each block-row are padded to the max tiles-per-row count;
the per-tile column indices are a scalar-prefetch operand, so the BlockSpec
index_map can steer the operand pipeline by the sparsity pattern
(pltpu.PrefetchScalarGridSpec; see the pallas guide's scalar-prefetch
pattern).  Padding tiles carry zero values and point at block-column 0.
"""

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _spmm_kernel(cols_ref, blocks_ref, x_ref, o_ref):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        o_ref[:, :] = jnp.zeros_like(o_ref)

    # HIGHEST: true-f32 MXU passes — the default bf16x3 route costs ~1e-3
    # relative error on ill-scaled stencil values
    o_ref[:, :] += jnp.dot(blocks_ref[0], x_ref[:, :],
                           preferred_element_type=o_ref.dtype,
                           precision=jax.lax.Precision.HIGHEST)


class PallasBsrMatrix:
    """BSR storage driven by the Pallas SpMM kernel."""

    def __init__(self, a, dtype=np.float32, bs=128, interpret=False):
        import scipy.sparse as scs
        from .spmm import _to_full_csr

        a = _to_full_csr(a)
        n = a.shape[0]
        nb = -(-n // bs)
        pad = nb * bs - n
        if pad:
            a = scs.csr_matrix(
                scs.vstack([scs.hstack([a, scs.csr_matrix((n, pad))]),
                            scs.csr_matrix((pad, nb * bs))]))
        ab = scs.bsr_matrix(a, blocksize=(bs, bs))
        ab.sort_indices()
        counts = np.diff(ab.indptr)
        maxt = max(1, int(counts.max()))
        nblocks = ab.data.shape[0]
        # pad each block-row's tile list to maxt
        cols = np.zeros((nb, maxt), dtype=np.int32)
        tiles = np.zeros((nb * maxt, bs, bs), dtype=dtype)
        for r in range(nb):
            c0, c1 = ab.indptr[r], ab.indptr[r + 1]
            cols[r, :c1 - c0] = ab.indices[c0:c1]
            tiles[r * maxt:r * maxt + (c1 - c0)] = ab.data[c0:c1]
        self.shape = (n, n)
        self.nnz = int(a.nnz)
        self.bs = bs
        self.nb = nb
        self.maxt = maxt
        self.n_padded = nb * bs
        self.cols = jnp.asarray(cols)
        self.tiles = jnp.asarray(tiles)
        self.interpret = interpret
        self.fill = self.nnz / float(nblocks * bs * bs)

    def matmat_t(self, xt):
        """(n, m) = A @ (n, m)."""
        n, m = xt.shape
        pad = self.n_padded - n
        if pad:
            xt = jnp.pad(xt, ((0, pad), (0, 0)))
        y = _pallas_bsr_matmat(self.cols, self.tiles, xt, self.nb,
                               self.maxt, self.bs, self.interpret)
        return y[:n] if pad else y


@partial(jax.jit, static_argnames=('nb', 'maxt', 'bs', 'interpret'))
def _pallas_bsr_matmat(cols, tiles, xt, nb, maxt, bs, interpret):
    m = xt.shape[1]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb, maxt),
        in_specs=[
            pl.BlockSpec((1, bs, bs), lambda i, j, cols: (i * maxt + j, 0, 0),
                         memory_space=pltpu.ANY
                         if False else pltpu.VMEM),
            pl.BlockSpec((bs, m), lambda i, j, cols: (cols[i, j], 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((bs, m), lambda i, j, cols: (i, 0),
                               memory_space=pltpu.VMEM),
    )
    flops = 2 * nb * maxt * bs * bs * m
    return pl.pallas_call(
        _spmm_kernel,
        out_shape=jax.ShapeDtypeStruct((nb * bs, m), xt.dtype),
        grid_spec=grid_spec,
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=tiles.size * tiles.dtype.itemsize
            + xt.size * xt.dtype.itemsize, transcendentals=0),
        interpret=interpret,
    )(cols, tiles, xt)
