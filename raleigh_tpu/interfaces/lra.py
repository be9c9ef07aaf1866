"""Lower-rank approximation L R ~= A (optionally mean-shifted), with warm
update and incremental (streaming) modes.

Capability parity with reference raleigh/interfaces/lra.py: compute
(lra.py:46-156), update of a previously computed approximation when new data
rows arrive — re-orthogonalization path chosen by the conditioning of the
factor Grams (lra.py:208-223,296-312), mean update for the grown dataset
(lra.py:233-251), tolerance-driven rank truncation (lra.py:314-359) — and
icompute, the batch-at-a-time streaming driver (lra.py:381-422).
"""

import math

import numpy as np
import numpy.linalg as nla
import scipy.linalg as sla

from ..core.solver import Options
from ..algebra.dense import AMatrix
from .partial_svd import PartialSVD
from .truncated_svd import DefaultStoppingCriteria


class LowerRankApproximation:
    """Holds and refines a lower-rank approximation of a dense matrix."""

    def __init__(self, mlr=None):
        if mlr is None:
            self.__mean = None
            self.__left = None
            self.__right = None
            self.__rank = 0
            self.__dtype = None
        else:
            self.__mean, self.__left, self.__right = mlr
            self.__rank = self.__right.shape[0]
            self.__dtype = self.__left.dtype.type
        self.__left_v = None
        self.__right_v = None
        self.__mean_v = None
        self.__tol = -1
        self.__svtol = 1e-3
        self.__norm = None
        self.__arch = None
        self.__opt = Options()
        self.ortho = 1.0
        self.iterations = -1

    def compute(self, matrix, opt=None, rank=-1, tol=0, norm='f',
                max_rank=-1, svtol=1e-3, shift=False, verb=0):
        """L R ~= A (shift=False) or A - e a (shift=True, a = row mean);
        rows of R orthonormal, columns of L by descending norm.  See
        reference lra.py:46-108 for the parameter contract."""
        if opt is None:
            opt = Options()
        if matrix.order() != 'C_CONTIGUOUS':
            raise ValueError('matrix must be C_CONTIGUOUS')
        psvd = PartialSVD(matrix, shift)

        user_bs = opt.block_size
        if user_bs < 1 and (rank < 0 or rank > 100):
            opt.block_size = 128
        no_cc = opt.convergence_criteria is None
        if no_cc:
            opt.convergence_criteria = _DefaultLRAConvergenceCriteria(svtol)
        no_sc = opt.stopping_criteria is None and rank < 0
        if no_sc:
            opt.stopping_criteria = DefaultStoppingCriteria(
                matrix, tol, norm, max_rank, verb)
            opt.stopping_criteria.err_calc.set_up(psvd.op_svd(),
                                                  psvd.vectors(), shift)

        psvd.compute(matrix, opt=opt, nsv=(0, rank), refine=self.ortho)
        self.__left_v = psvd.left_v()
        self.__left_v.scale(psvd.sigma, multiply=True)
        self.__right_v = psvd.right_v()
        self.__mean_v = psvd.mean_v()
        self.__rank = self.__left_v.nvec()
        self.__opt = opt
        self.__tol = tol
        self.__svtol = svtol
        self.__norm = norm
        self.__arch = matrix.arch()
        self.__dtype = matrix.data_type()
        cap = rank if rank > 0 else max_rank
        if cap > 0 and self.__left_v.nvec() > cap:
            # the block sweep may lock a few extra pairs in its last
            # iteration; deliver exactly what was asked for
            self.__left_v.select(cap)
            self.__right_v.select(cap)
            self.__rank = cap
        self.iterations = psvd.iterations
        self.__left = None
        self.__right = None
        self.__mean = None

        opt.block_size = user_bs
        if no_cc:
            opt.convergence_criteria = None
        if no_sc:
            opt.stopping_criteria = None

    def update(self, matrix, opt=None, rank=-1, max_rank=-1,
               tol=None, norm=None, svtol=None, verb=0):
        """Update a previously computed LRA of matrix0 into the LRA of
        vstack((matrix0, matrix)) (reference lra.py:158-379)."""
        if self.__rank == 0:
            raise RuntimeError('no existing LRA data to update')
        if opt is None:
            opt = self.__opt
        if tol is None:
            tol = self.__tol
        if tol == 0.0 and rank < 1:
            rank = self.__rank
        if norm is None:
            norm = self.__norm
        if svtol is None:
            svtol = self.__svtol
        if norm not in ('f', 'm', 's'):
            raise ValueError('norm %r is not supported' % norm)
        v = matrix.as_vectors()
        s = np.abs(v.dots(v).real)
        maxl2norm = np.amax(np.sqrt(s))
        if maxl2norm == 0.0:
            return
        dtype = self.__dtype

        if self.__left_v is None:
            # rebuild Vectors state from the (mean, L, R) ndarray triple
            left_data = np.ascontiguousarray(self.__left.T)
            self.__left_v = v.new_vectors(left_data)
            self.__right_v = v.new_vectors(self.__right)
            self.__mean_v = (v.new_vectors(self.__mean)
                             if self.__mean is not None else None)
            self.__arch = matrix.arch()
        elif self.__arch != matrix.arch() or dtype != matrix.data_type():
            raise ValueError('incompatible matrix passed to update')
        left0 = self.__left_v
        right0 = self.__right_v

        if self.ortho < 1.0:
            self._reorthogonalize(left0, right0)

        shift = self.__mean_v is not None
        sigma = np.sqrt(np.abs(left0.dots(left0).real))
        sigma0 = sigma[0]
        n0 = left0.dimension()
        e0 = np.ones((n0, 1), dtype=dtype)
        n1 = v.nvec()
        e1 = np.ones((n1, 1), dtype=dtype)
        n = n0 + n1

        if shift:
            # merge means and absorb the mean change into the old factors
            mean0 = self.__mean_v.data()
            mean1v = v.new_vectors(1, v.dimension())
            v.multiply(e1, mean1v)
            mean1 = mean1v.data() / n1
            mean = (n0 / n) * mean0 + (n1 / n) * mean1
            diff = mean0 - mean
            vdiff = v.new_vectors(diff.astype(dtype))
            vdiff0 = vdiff.orthogonalize(right0)
            diff0 = vdiff0.data().T
            s1 = nla.norm(vdiff.data()) * e0[:1]
            vdiff.scale(s1)
            e0v = v.new_vectors(e0.T)
            left0.add(e0v, 1.0, diff0)
            if right0.nvec() < right0.dimension():
                # out-of-span part of the mean change; exactly zero (up to
                # rounding) when the old basis already spans the space, in
                # which case appending would overflow the feature dimension
                e0v.scale(s1, multiply=True)
                left0.append(e0v)
                right0.append(vdiff)
            vmean = v.new_vectors(mean.astype(dtype))
            v.add(vmean, -1.0, e1.T)
        else:
            mean = None
            vmean = None

        s = np.abs(v.dots(v).real)
        fnorm = math.sqrt(np.sum(s))
        maxl2norm = np.amax(np.sqrt(s))

        left1 = v.orthogonalize(right0)

        # compute new components of the residual data
        lra_new = LowerRankApproximation()
        if rank < 0:
            if norm == 'f':
                update_tol = -tol * fnorm
            elif norm == 'm':
                update_tol = -tol * maxl2norm
            else:
                update_tol = -tol * sigma0
            urank = max_rank * n1 // (n0 + n1)
            lra_new.compute(matrix, opt, tol=update_tol, norm=norm,
                            max_rank=urank, verb=verb)
        else:
            urank = rank * n1 // (n0 + n1)
            if verb > 0:
                print('computing new %d components...' % urank)
            lra_new.compute(matrix, opt, rank=urank, verb=verb)

        left11 = lra_new.left_v()
        right10 = lra_new.right_v()

        # the merged basis cannot exceed the feature dimension: cap the
        # appended new components (sorted descending, so keeping the head
        # is the right truncation) — an overcomplete block would break the
        # SVD re-orthonormalization downstream
        avail = right0.dimension() - right0.nvec()
        if left11.nvec() > avail:
            left11.select(max(avail, 0))
            right10.select(max(avail, 0))

        # merge: grow left0 with zero block, stack rows, append new comps
        new = left11.nvec()
        if new > 0:
            pad = left0.new_vectors(new)
            pad.zero()
            left0.append(pad)
            left1.append(left11)
            right0.append(right10)
        merged = np.concatenate((left0.data(), left1.data()), axis=1)
        left0 = left0.new_vectors(merged)
        self.__left_v = left0
        self.__right_v = right0

        self._reorthogonalize(left0, right0, full=True)

        # tolerance-driven truncation of trailing components
        if rank < 0:
            ncomp = right0.nvec()
            if norm == 'f':
                r = left0.dots(left0).real
                s2 = math.sqrt(np.sum(r))
            elif norm == 'm':
                r = left0.dots(left0, transp=True).real
                s2 = np.amax(np.sqrt(np.abs(r)))
            else:
                s2 = sigma[0]
            eps = s2 * tol / 4
            if norm == 'm':
                errs = np.zeros((1, n))
            s2 = 0
            i = 1
            while i < ncomp:
                if norm == 'f':
                    s2 = math.sqrt(s2 * s2 + r[ncomp - i])
                elif norm == 'm':
                    left0.select(1, ncomp - i)
                    lft = left0.data()
                    errs += (lft * lft.conj()).real
                    s2 = np.amax(np.sqrt(errs))
                else:
                    s2 = sigma[ncomp - i] if ncomp - i < len(sigma) else 0.0
                if s2 > eps:
                    break
                i += 1
            i -= 1
            if i > 0:
                if verb > 0:
                    print('discarding %d components out of %d' % (i, ncomp))
                ncomp -= i
        else:
            ncomp = rank

        left0.select(ncomp)
        right0.select(ncomp)
        self.__left = None
        self.__right = None
        self.__mean = None
        if shift:
            self.__mean_v = vmean
        self.__rank = ncomp
        self.__tol = tol
        self.__svtol = svtol
        self.__norm = norm
        self.__arch = matrix.arch()
        self.__dtype = matrix.data_type()
        if max_rank > 0 and ncomp > max_rank:
            self.__left_v.select(max_rank)
            self.__right_v.select(max_rank)
            self.__rank = max_rank
        self.iterations += lra_new.iterations

    def _reorthogonalize(self, left0, right0, full=False):
        """Restore the LRA invariant (R rows orthonormal, L columns
        orthogonal, descending): cheap generalized-eigenproblem route when
        the right Gram is well conditioned, two-sided SVD otherwise
        (reference lra.py:208-223,296-312)."""
        wl = left0.new_vectors(left0.nvec())
        wr = right0.new_vectors(right0.nvec())
        H = right0.dot(right0)
        mu = sla.eigh(H, eigvals_only=True)
        q = mu[0] if full else mu[0] / mu[-1]
        if q < 0.5:
            _lra_ortho(left0, right0, wl, wr)
        else:
            G = left0.dot(left0)
            lmd, x = sla.eigh(-G, H)
            y = nla.inv(x.T)
            left0.multiply(y, wl)
            wl.copy(left0)
            right0.multiply(x, wr)
            wr.copy(right0)

    def icompute(self, matrix, batch_size, opt=None, rank=-1, tol=0,
                 norm='f', max_rank=-1, svtol=1e-3, shift=False,
                 arch='cpu', verb=0):
        """Streaming LRA: compute on the first batch of rows, update on each
        subsequent batch (reference lra.py:381-422)."""
        if opt is None:
            opt = Options()
        data_size = matrix.shape[0]
        batch_size = min(batch_size, data_size)
        batch = 0
        if self.__rank == 0:
            if verb > 0:
                print('processing batch %d of size %d' % (batch, batch_size))
            mb = AMatrix(matrix[:batch_size, :], arch=arch)
            self.compute(mb, opt=opt, rank=rank, tol=tol, norm=norm,
                         max_rank=max_rank, svtol=svtol, shift=shift,
                         verb=verb)
            first = batch_size
            batch += 1
        else:
            first = 0
        while first < data_size:
            nxt = min(data_size, first + batch_size)
            if verb > 0:
                print('processing batch %d of size %d' % (batch, nxt - first))
            mb = AMatrix(matrix[first:nxt, :], arch=arch, copy_data=True)
            self.update(mb, opt=opt, rank=rank, tol=tol, norm=norm,
                        max_rank=max_rank, svtol=svtol, verb=verb)
            first = nxt
            batch += 1

    # -- result accessors --------------------------------------------------

    def mean(self):
        if self.__mean is None and self.__mean_v is not None:
            self.__mean = self.__mean_v.data()
        return self.__mean

    def left(self):
        if self.__left is None and self.__left_v is not None:
            self.__left = self.__left_v.data().T
        return self.__left

    def right(self):
        if self.__right is None and self.__right_v is not None:
            self.__right = self.__right_v.data()
        return self.__right

    def mean_v(self):
        return self.__mean_v

    def left_v(self):
        return self.__left_v

    def right_v(self):
        return self.__right_v


class _DefaultLRAConvergenceCriteria:
    """Relative-residual test scaled by (lmd/lmd_max)^1.5
    (reference lra.py:452-463)."""

    def __init__(self, tol):
        self.tolerance = tol

    def set_tolerance(self, tolerance):
        self.tolerance = tolerance

    def satisfied(self, solver, i):
        res = solver.convergence_data('residual', i)
        lmd = solver.convergence_data('eigenvalue', i)
        lmd_max = solver.convergence_data('max eigenvalue', i)
        tol = abs(lmd / lmd_max) ** 1.5 * self.tolerance
        return res >= 0 and res * res <= tol


def _lra_ortho(v, u, wv, wu):
    """Two-sided SVD re-orthogonalization of the pair (L=v, R=u)
    (reference lra.py:473-482)."""
    u.copy(wu)
    s, q = wu.svd()
    v.multiply(q, wv)
    wv.scale(s, multiply=True)
    wv.copy(v)
    s, q = v.svd()
    wu.multiply(q, u)
    v.scale(s, multiply=True)
