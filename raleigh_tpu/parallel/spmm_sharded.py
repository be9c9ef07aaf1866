"""Row-partitioned sharded SpMM with neighbor halo exchange.

The multi-chip sparse kernel the SURVEY's north star calls for: the
symmetric matrix is bandwidth-reduced (reverse Cuthill-McKee), its ELL
structure row-partitioned over the mesh, and each shard computes its row
block against its local slice of the operand plus a halo of neighbor rows
fetched with ``lax.ppermute`` over ICI — communication proportional to the
matrix bandwidth, not to n, and overlapped with local compute by XLA's
latency-hiding scheduler.

Operand layout matches the framework's block-vector sharding: the
transposed block (n, m) sharded along n (PartitionSpec(AXIS, None)).
"""

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import NamedSharding, PartitionSpec as P
try:
    from jax import shard_map
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map

from .mesh import AXIS


class ShardedEllMatrix:
    """Symmetric sparse matrix in RCM-reordered, row-sharded ELL form."""

    def __init__(self, a, mesh, dtype=np.float32, pad_to=8):
        import scipy.sparse as scs
        from scipy.sparse.csgraph import reverse_cuthill_mckee
        from ..ops.spmm import _to_full_csr

        a = _to_full_csr(a)
        n0 = a.shape[0]
        perm = np.asarray(reverse_cuthill_mckee(a, symmetric_mode=True))
        a = a[perm, :][:, perm].tocsr()
        a.sort_indices()

        nshards = mesh.shape[AXIS]
        # pad n to a multiple of the shard count
        chunk = -(-n0 // nshards)
        n = chunk * nshards
        if n > n0:
            a = scs.csr_matrix(
                scs.vstack([scs.hstack([a, scs.csr_matrix((n0, n - n0))]),
                            scs.csr_matrix((n - n0, n))]))
        deg = np.diff(a.indptr)
        k = max(1, int(deg.max()))
        k = ((k + pad_to - 1) // pad_to) * pad_to
        idx = np.zeros((n, k), dtype=np.int32)
        val = np.zeros((n, k), dtype=dtype)
        rows = np.repeat(np.arange(n), deg)
        offs = np.arange(a.nnz) - np.repeat(a.indptr[:-1], deg)
        idx[rows, offs] = a.indices
        val[rows, offs] = a.data.astype(dtype)

        # halo width: how far any row's columns reach outside its chunk
        chunk_of = np.arange(n) // chunk
        col_chunk = idx // chunk
        reach = np.abs(col_chunk - chunk_of[:, None])
        reach[val == 0] = 0
        if reach.max() > 1:
            raise ValueError(
                'matrix bandwidth exceeds one chunk even after RCM; use '
                'more rows per shard (fewer shards) or the replicated SpMM')
        lo = (np.arange(n) // chunk) * chunk
        halo = 0
        nz = val != 0
        if nz.any():
            below = (idx - lo[:, None])[nz]
            above = (idx - (lo[:, None] + chunk - 1))[nz]
            halo = max(int(max(-below.min(), 0)), int(max(above.max(), 0)))
        halo = min(max(halo, 1), chunk)
        # local indices into [halo | chunk | halo]
        idx_local = np.clip(idx - lo[:, None] + halo, 0, chunk + 2 * halo - 1)

        self.mesh = mesh
        self.shape = (n0, n0)
        self.n_padded = n
        self.chunk = chunk
        self.halo = halo
        self.nnz = int(a.nnz)
        self.perm = perm
        self.iperm = np.empty_like(perm)
        self.iperm[perm] = np.arange(n0)
        sh = NamedSharding(mesh, P(AXIS, None))
        self.idx = jax.device_put(idx_local, sh)
        self.val = jax.device_put(val, sh)
        self.row_degree = k
        self.dtype = dtype

    def matmat_t(self, xt):
        """(n0, m) = A_original @ (n0, m); operand in ORIGINAL ordering,
        output in original ordering (permutations applied on device)."""
        n0, m = xt.shape
        sh = NamedSharding(self.mesh, P(AXIS, None))
        xt = jnp.asarray(xt)
        xp = jnp.take(xt, jnp.asarray(self.perm), axis=0)
        if self.n_padded > n0:
            xp = jnp.pad(xp, ((0, self.n_padded - n0), (0, 0)))
        xp = jax.device_put(xp, sh)
        y = _sharded_ell(self.idx, self.val, xp, self.mesh, self.halo)
        y = y[:n0]
        return jnp.take(y, jnp.asarray(self.iperm), axis=0)


@partial(jax.jit, static_argnames=('mesh', 'halo'))
def _sharded_ell(idx, val, xt, mesh, halo):
    nshards = mesh.shape[AXIS]
    perm_fwd = [(i, (i + 1) % nshards) for i in range(nshards)]
    perm_bwd = [(i, (i - 1) % nshards) for i in range(nshards)]

    def kernel(idx_l, val_l, x_l):
        # fetch neighbor halos over ICI
        left = lax.ppermute(x_l[-halo:], AXIS, perm=perm_fwd)
        right = lax.ppermute(x_l[:halo], AXIS, perm=perm_bwd)
        xe = jnp.concatenate([left, x_l, right])

        def step(acc, ev):
            ci, cv = ev
            return acc + cv[:, None] * jnp.take(xe, ci, axis=0), None

        init = jnp.zeros_like(x_l)
        acc, _ = lax.scan(step, init, (jnp.moveaxis(idx_l, 1, 0),
                                       jnp.moveaxis(val_l, 1, 0)))
        return acc

    return shard_map(kernel, mesh=mesh,
                     in_specs=(P(AXIS, None), P(AXIS, None), P(AXIS, None)),
                     out_specs=P(AXIS, None))(idx, val, xt)
