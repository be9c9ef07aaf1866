"""JAX device implementation of the block-vector algebra contract.

This is the TPU-native replacement for the reference's MKL/CUBLAS backends
(raleigh/algebra/dense_cblas.py, dense_cublas.py): one implementation that
runs on TPU (or any XLA device), single chip or sharded over a
``jax.sharding.Mesh``.

Design:

  * A block of ``m`` vectors of dimension ``n`` is a ``(capacity, n)``
    ``jax.Array`` plus a host-side selection window ``(first, nvec)`` — the
    same "selection window" contract the reference documents at
    raleigh/core/solver.py:32-37, but with *functional* updates: every
    mutating contract op rebuilds the storage array via
    ``lax.dynamic_update_slice`` inside a jitted kernel with the window size
    as a static argument, so XLA sees static shapes and can tile GEMMs onto
    the MXU.  Buffer donation keeps the updates in place on device.

  * All O(m*n) work (Gram matrices, linear combinations, operator
    applications) is device GEMMs; the small O(m^2) results are returned to
    the host as NumPy arrays, exactly where the reference brings Gram
    matrices back for SciPy factorizations (dense_cublas.py:265-269).

  * When the storage carries a ``NamedSharding`` over the vector dimension,
    the same jitted kernels run SPMD: XLA's partitioner turns the contraction
    over ``n`` in ``dot``/``dots`` into local GEMM + psum over the mesh (ICI
    collectives), and linear combinations stay embarrassingly parallel.
    This is the TPU equivalent of the "MPI Vectors implementation" the
    reference leaves as future work (core/solver.py:98-102).

Randomness: ``fill_random`` draws on the host with NumPy's global generator
(uniform in [-1, 1)) and uploads — bit-identical to the host backend, which
keeps differential tests exact and results reproducible via
``numpy.random.seed`` like every reference script.
"""

import numbers
import os
from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

# On the TPU MXU a "default"-precision f32 matmul truncates operands to
# bfloat16; an eigensolver's Gram matrices and residuals need true f32, so we
# default the whole process to the 3-pass bf16 scheme (~f32 quality).  Opt
# out with RALEIGH_TPU_MATMUL_PRECISION=default for bandwidth-bound PCA-style
# workloads that tolerate it.
jax.config.update('jax_default_matmul_precision',
                  os.environ.get('RALEIGH_TPU_MATMUL_PRECISION', 'highest'))


def _cj(a):
    return a.conj() if jnp.iscomplexobj(a) else a


def _win(arr, first, k):
    """Select the k-row window starting at (traced) row ``first``."""
    return lax.dynamic_slice_in_dim(arr, first, k, axis=0)


# ---------------------------------------------------------------------------
# jitted kernels (static window sizes; traced window offsets)
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=('ka', 'kb'))
def _k_gram(a, fa, ka, b, fb, kb):
    # rows of result indexed by b's vectors, cols by a's (contract: dot)
    wa = _win(a, fa, ka)
    wb = _win(b, fb, kb)
    return jnp.matmul(_cj(wb), wa.T, preferred_element_type=wa.dtype)


@partial(jax.jit, static_argnames=('k',))
def _k_dots(a, fa, b, fb, k):
    wa = _win(a, fa, k)
    wb = _win(b, fb, k)
    return jnp.einsum('ij,ij->i', _cj(wb), wa)


@partial(jax.jit, static_argnames=('k',))
def _k_dots_t(a, fa, b, fb, k):
    wa = _win(a, fa, k)
    wb = _win(b, fb, k)
    return jnp.einsum('ij,ij->j', _cj(wb), wa)


@partial(jax.jit, static_argnames=('ka', 'ko'), donate_argnames=('out',))
def _k_multiply(a, fa, ka, q, out, fo, ko):
    w = jnp.matmul(q.T, _win(a, fa, ka), preferred_element_type=a.dtype)
    return lax.dynamic_update_slice_in_dim(out, w.astype(out.dtype), fo, 0)


@partial(jax.jit, static_argnames=('ks', 'ko'), donate_argnames=('s',))
def _k_add_scalar(s, fs, ks, o, fo, ko, alpha):
    w = _win(s, fs, ks) + alpha * _win(o, fo, ks)
    return lax.dynamic_update_slice_in_dim(s, w, fs, 0)


@partial(jax.jit, static_argnames=('ks', 'ko'), donate_argnames=('s',))
def _k_add_combi(s, fs, ks, o, fo, ko, alpha, q):
    w = _win(s, fs, ks) + alpha * jnp.matmul(
        q.T, _win(o, fo, ko), preferred_element_type=s.dtype).astype(s.dtype)
    return lax.dynamic_update_slice_in_dim(s, w, fs, 0)


@partial(jax.jit, static_argnames=('k',), donate_argnames=('s',))
def _k_add_rows(s, fs, o, fo, k, coef):
    w = _win(s, fs, k) + coef[:, None] * _win(o, fo, k)
    return lax.dynamic_update_slice_in_dim(s, w, fs, 0)


@partial(jax.jit, static_argnames=('k',), donate_argnames=('dst',))
def _k_copy(src, fsrc, dst, fdst, k):
    w = _win(src, fsrc, k).astype(dst.dtype)
    return lax.dynamic_update_slice_in_dim(dst, w, fdst, 0)


@partial(jax.jit, donate_argnames=('dst',))
def _k_copy_indexed(src, ind, dst, fdst):
    w = jnp.take(src, ind, axis=0).astype(dst.dtype)
    return lax.dynamic_update_slice_in_dim(dst, w, fdst, 0)


@partial(jax.jit, static_argnames=('k', 'multiply'), donate_argnames=('s',))
def _k_scale(s, fs, k, coef, multiply):
    w = _win(s, fs, k)
    c = coef[:, None].astype(s.dtype)
    if multiply:
        w = w * c
    else:
        w = w / jnp.where(c == 0, jnp.ones_like(c), c)
    return lax.dynamic_update_slice_in_dim(s, w, fs, 0)


@partial(jax.jit, static_argnames=('k',), donate_argnames=('s',))
def _k_fill_value(s, fs, k, value):
    w = jnp.full((k, s.shape[1]), value, dtype=s.dtype)
    return lax.dynamic_update_slice_in_dim(s, w, fs, 0)


@partial(jax.jit, static_argnames=('k',), donate_argnames=('s',))
def _k_set_rows(s, fs, k, rows):
    return lax.dynamic_update_slice_in_dim(s, rows.astype(s.dtype), fs, 0)


@partial(jax.jit, static_argnames=('ks', 'ko'), donate_argnames=('s',))
def _k_ortho(s, fs, ks, o, fo, ko):
    """s := s - q^T o with q = conj(o) s^T;  returns (new s, q)."""
    ws = _win(s, fs, ks)
    wo = _win(o, fo, ko)
    q = jnp.matmul(_cj(wo), ws.T, preferred_element_type=ws.dtype)
    w = ws - jnp.matmul(q.T, wo, preferred_element_type=ws.dtype)
    return lax.dynamic_update_slice_in_dim(s, w, fs, 0), q


@partial(jax.jit, static_argnames=('kx', 'ky', 'transp', 'conj_a'),
         donate_argnames=('y',))
def _k_apply_dense(a, x, fx, kx, y, fy, ky, transp, conj_a):
    wx = _win(x, fx, kx)
    if transp:
        am = _cj(a) if conj_a else a
        w = jnp.matmul(wx, am, preferred_element_type=wx.dtype)
    else:
        w = jnp.matmul(wx, a.T, preferred_element_type=wx.dtype)
    return lax.dynamic_update_slice_in_dim(y, w.astype(y.dtype), fy, 0)


# ---------------------------------------------------------------------------


class Vectors:
    """Selectable window over a block of row-vectors, jax.Array storage."""

    def __init__(self, arg, nvec=0, data_type=None, shallow=False,
                 sharding=None):
        self._sharding = sharding
        if isinstance(arg, Vectors):
            f, k = arg.selected()
            block = _win(arg._array, f, k) if (f, k) != (0, arg._array.shape[0]) \
                else arg._array
            # jax arrays are immutable: "shallow" and deep copies coincide
            self._array = block
            self._sharding = arg._sharding
        elif isinstance(arg, Matrix):
            self._array = arg._data
            self._sharding = arg._sharding
        elif isinstance(arg, (np.ndarray, jax.Array)):
            self._array = self._put(np.ascontiguousarray(arg)
                                    if isinstance(arg, np.ndarray) else arg)
        elif isinstance(arg, numbers.Number):
            dt = data_type if data_type is not None else jnp.float32
            self._array = self._put(jnp.zeros((nvec, int(arg)), dtype=dt))
        else:
            raise ValueError('cannot build Vectors from %r' % type(arg))
        m = self._array.shape[0]
        self._sel = (0, m)

    def _put(self, a):
        if self._sharding is not None:
            return jax.device_put(a, self._sharding)
        return jnp.asarray(a)

    # ---- storage / selection -------------------------------------------

    def dimension(self):
        return self._array.shape[1]

    def nvec(self):
        return self._sel[1]

    def select(self, nv, first=0):
        assert first >= 0 and first + nv <= self._array.shape[0]
        self._sel = (first, nv)

    def select_all(self):
        self._sel = (0, self._array.shape[0])

    def selected(self):
        return self._sel

    def data_type(self):
        return np.dtype(self._array.dtype).type

    def is_complex(self):
        return jnp.iscomplexobj(self._array)

    def all_data(self):
        return np.asarray(self._array)

    def data(self, i=None):
        f, k = self._sel
        host = np.asarray(_win(self._array, f, k))
        return host if i is None else host[i]

    def device_data(self):
        f, k = self._sel
        return _win(self._array, f, k)

    def new_vectors(self, arg=0, dim=None):
        if isinstance(arg, (np.ndarray, jax.Array)):
            v = Vectors.__new__(Vectors)
            v._sharding = self._sharding
            a = jnp.asarray(arg)
            if a.dtype != self._array.dtype and (
                    jnp.iscomplexobj(self._array) == jnp.iscomplexobj(a)):
                a = a.astype(self._array.dtype)
            v._array = v._put(a)
            v._sel = (0, v._array.shape[0])
            return v
        if dim is None:
            dim = self.dimension()
        return Vectors(dim, arg, self.data_type(), sharding=self._sharding)

    def clone(self):
        return Vectors(self)

    def reference(self):
        return Vectors(self, shallow=True)

    def append(self, other, axis=0):
        if axis == 0:
            f, k = self._sel
            self._array = jnp.concatenate(
                (_win(self._array, f, k), other.device_data()))
        else:
            self._array = jnp.concatenate(
                (self._array, other._array), axis=1)
        if self._sharding is not None:
            self._array = jax.device_put(self._array, self._sharding)
        self.select_all()

    # ---- fills ----------------------------------------------------------

    def zero(self):
        f, k = self._sel
        self._array = _k_fill_value(self._array, f, k,
                                    np.zeros((), self.data_type()))

    def fill(self, value):
        f, k = self._sel
        if isinstance(value, numbers.Number):
            self._array = _k_fill_value(self._array, f, k,
                                        np.asarray(value, self.data_type()))
        else:
            rows = jnp.broadcast_to(jnp.asarray(value),
                                    (k, self.dimension()))
            self._array = _k_set_rows(self._array, f, k, rows)

    def fill_random(self):
        f, k = self._sel
        rows = (2 * np.random.rand(k, self.dimension()) - 1).astype(
            self.data_type())
        self._array = _k_set_rows(self._array, f, k, jnp.asarray(rows))

    def fill_orthogonal(self):
        from .dense_numpy import _hadamard_like_fill
        f, k = self._sel
        a = np.zeros((k, self.dimension()), dtype=self.data_type())
        _hadamard_like_fill(a)
        self._array = _k_set_rows(self._array, f, k, jnp.asarray(a))

    # ---- contract ops ---------------------------------------------------

    def copy(self, other, ind=None):
        if ind is None:
            assert self.nvec() == other.nvec()
            other._array = _k_copy(self._array, self._sel[0],
                                   other._array, other._sel[0], self.nvec())
        else:
            ind = jnp.asarray(np.asarray(ind, dtype=np.int32))
            other._array = _k_copy_indexed(self._array, ind,
                                           other._array, other._sel[0])

    def scale(self, s, multiply=False):
        f, k = self._sel
        coef = jnp.asarray(np.asarray(s).reshape(-1)[:k])
        self._array = _k_scale(self._array, f, k, coef, multiply)

    def dots(self, other, transp=False):
        if transp:
            r = _k_dots_t(self._array, self._sel[0],
                          other._array, other._sel[0], self.nvec())
        else:
            r = _k_dots(self._array, self._sel[0],
                        other._array, other._sel[0], self.nvec())
        return np.asarray(r)

    def dot(self, other):
        r = _k_gram(self._array, self._sel[0], self.nvec(),
                    other._array, other._sel[0], other.nvec())
        return np.asarray(r)

    def multiply(self, q, output):
        assert output.nvec() == q.shape[1]
        q = jnp.asarray(np.asarray(q, dtype=self.data_type())
                        if not isinstance(q, jax.Array) else q)
        output._array = _k_multiply(self._array, self._sel[0], self.nvec(),
                                    q, output._array, output._sel[0],
                                    output.nvec())

    def add(self, other, s, q=None):
        f, k = self._sel
        if np.isscalar(s):
            alpha = np.asarray(s, dtype=np.result_type(self.data_type()))
            if q is None:
                self._array = _k_add_scalar(self._array, f, k,
                                            other._array, other._sel[0],
                                            other.nvec(), alpha)
            else:
                qj = jnp.asarray(np.asarray(q))
                self._array = _k_add_combi(self._array, f, k,
                                           other._array, other._sel[0],
                                           other.nvec(), alpha, qj)
        else:
            coef = jnp.asarray(np.asarray(s).reshape(-1)[:k])
            self._array = _k_add_rows(self._array, f, other._array,
                                      other._sel[0], k, coef)

    # ---- backend extras -------------------------------------------------

    def orthogonalize(self, other):
        self._array, q = _k_ortho(self._array, self._sel[0], self.nvec(),
                                  other._array, other._sel[0], other.nvec())
        return self.new_vectors(np.asarray(q))

    def svd(self):
        """Economy SVD of the selected block: storage rows become the right
        singular vectors V^H, returns (sigma, conj(U)).

        TPU-native formulation: Gram matrix on device + small host eigh +
        device rotation, followed by one Cholesky-QR refinement pass — the
        tall-skinny-QR-friendly scheme the reference itself uses for
        ``_finalize_svd`` (raleigh/interfaces/partial_svd.py:162-235) —
        instead of a monolithic host gesvd (dense_cublas.py:537).
        """
        f, k = self._sel
        dt = self.data_type()
        # Gram of the block: self.dot(self) returns conj(X) X^T = conj(X X^H)
        g = np.conj(np.asarray(_k_gram(self._array, f, k, self._array, f, k)))
        g = 0.5 * (g + g.conj().T)
        lmd, u = np.linalg.eigh(g)                       # ascending
        lmd, u = lmd[::-1].copy(), u[:, ::-1].copy()     # G = U S^2 U^H
        sigma = np.sqrt(np.maximum(lmd, 0.0))
        floor = max(np.sqrt(np.finfo(sigma.dtype).tiny),
                    np.finfo(sigma.dtype).eps * max(sigma[0], 1.0))
        inv = 1.0 / np.maximum(sigma, floor)
        # V^H = S^-1 U^H X:  rows := q^T rows  with  q = conj(U S^-1)
        q0 = np.conj(u * inv[None, :]).astype(dt, copy=False)
        self._array = _k_multiply(self._array, f, k, jnp.asarray(q0),
                                  self._array, f, k)
        # one Cholesky-QR refinement: restores orthonormality lost to the
        # squared condition number of the Gram route
        g2 = np.conj(np.asarray(
            _k_gram(self._array, f, k, self._array, f, k)))
        g2 = 0.5 * (g2 + g2.conj().T)
        try:
            c = np.linalg.cholesky(g2).conj().T          # g2 = C^H C
            ci = np.linalg.inv(c)
            # rows := C^-H rows  =>  q = conj(C^-1)
            self._array = _k_multiply(self._array, f, k,
                                      jnp.asarray(np.conj(ci).astype(dt)),
                                      self._array, f, k)
            # X = U S (C^H V^H_new): absorb C^H into the small factor
            t = (u * sigma[None, :]) @ c.conj().T
            p, sigma, qh = np.linalg.svd(t)
            # rows := Q^H rows with Q^H = qh  =>  q = conj(qh^T) = qh^H
            self._array = _k_multiply(self._array, f, k,
                                      jnp.asarray(qh.conj().T.astype(dt)),
                                      self._array, f, k)
            u = p
        except np.linalg.LinAlgError:
            pass
        return sigma.astype(_real_dtype(dt)), _cj_np(u.astype(dt))

    def apply(self, A, output, transp=False):
        A.apply(self, output, transp=transp)


def _real_dtype(dt):
    return np.zeros((), dt).real.dtype.type


def _cj_np(a):
    return a.conj() if np.iscomplexobj(a) else a


class Matrix:
    """Dense operator with jax.Array storage (optionally sharded over the
    feature dimension).  ``apply``: y = x @ A^T, adjoint: y = x @ conj(A)."""

    def __init__(self, arg, sharding=None):
        self._sharding = sharding
        if isinstance(arg, Vectors):
            self._data = arg.device_data()
            self._sharding = arg._sharding
        elif isinstance(arg, (np.ndarray, jax.Array)):
            a = jnp.asarray(arg) if isinstance(arg, jax.Array) \
                else jnp.asarray(np.ascontiguousarray(arg))
            self._data = (jax.device_put(a, sharding)
                          if sharding is not None else a)
        else:
            raise ValueError('cannot build Matrix from %r' % type(arg))

    def data(self):
        return np.asarray(self._data)

    def shape(self):
        return self._data.shape

    def data_type(self):
        return np.dtype(self._data.dtype).type

    def is_complex(self):
        return jnp.iscomplexobj(self._data)

    def order(self):
        return 'C_CONTIGUOUS'

    def apply(self, x, y, transp=False):
        y._array = _k_apply_dense(self._data, x._array, x._sel[0], x.nvec(),
                                  y._array, y._sel[0], y.nvec(),
                                  transp, self.is_complex())

    def dots(self):
        v = Vectors(self, shallow=True)
        return v.dots(v)

    def new_vectors(self, dim=None, nv=0):
        if dim is None:
            dim = self._data.shape[1]
        return Vectors(dim, nv, self.data_type(), sharding=self._sharding)
