"""Truncated SVD with tolerance-driven, capped, or interactive stopping.

Capability parity with reference raleigh/interfaces/truncated_svd.py:
top-k or tolerance-driven truncation in three error norms ('s' spectral,
'f' Frobenius, 'm' max row norm), an incremental per-row residual-norm
error calculator (truncated_svd.py:131-202), interactive "more?" stopping
(truncated_svd.py:277), a user-pluggable stopping criterion that recomputes
the current (U, Sigma) from converged right vectors (truncated_svd.py:
322-385), and side-effect-free restoration of user options
(truncated_svd.py:121-126).
"""

import math
import time

import numpy as np
import numpy.linalg as nla

from ..core.solver import Options
from ..algebra.dense import AMatrix
from .partial_svd import PartialSVD


def truncated_svd(A, opt=None, nsv=-1, tol=0, norm='s', msv=-1, vtol=0,
                  arch='cpu', verb=0):
    """Compute the leading part of the SVD of a dense matrix A.

    Parameters follow the reference contract (truncated_svd.py:24-92):
    ``nsv`` requested number of singular triplets (negative: driven by
    ``tol`` in norm ``norm``, or interactively when ``tol == 0``); ``msv``
    caps the number computed; ``vtol`` is the singular-vector error
    tolerance; ``arch`` selects 'cpu' (host) or 'tpu' (device) algebra.

    Returns (u, sigma, vt).
    """
    if opt is None:
        opt = Options()
    matrix = AMatrix(A, arch=arch)
    psvd = PartialSVD(matrix)

    user_bs = opt.block_size
    if user_bs < 1 and (nsv < 0 or nsv > 100):
        opt.block_size = 128
    no_cc = opt.convergence_criteria is None
    if no_cc:
        if vtol <= 0:
            vtol = math.sqrt(np.finfo(A.dtype).eps)
        opt.convergence_criteria = _DefaultSVDConvergenceCriteria(vtol)
    no_sc = opt.stopping_criteria is None and nsv < 0
    if no_sc:
        opt.stopping_criteria = DefaultStoppingCriteria(
            matrix, tol, norm, msv, verb)
        opt.stopping_criteria.err_calc.set_up(psvd.op_svd(), psvd.vectors(),
                                              shift=False)

    psvd.compute(matrix, opt, nsv=(0, nsv))
    u = psvd.left()
    v = psvd.right()
    sigma = psvd.sigma
    if msv > 0 and u.shape[1] > msv:
        u = u[:, :msv]
        v = v[:, :msv]
        sigma = sigma[:msv]

    # restore user options to avoid side effects
    opt.block_size = user_bs
    if no_cc:
        opt.convergence_criteria = None
    if no_sc:
        opt.stopping_criteria = None
    return u, sigma, v.T


class TruncatedSVDErrorCalculator:
    """Tracks per-row norms of the residual D = A - U S V' incrementally:
    each new converged component subtracts its per-row projection via
    Pythagoras (reference truncated_svd.py:131-202)."""

    def __init__(self, a):
        m, n = a.shape()
        self.dt = a.data_type()
        s = a.dots()
        self.norms = np.sqrt(s.reshape((m, 1)).real)
        self.err = self.norms.copy()
        self.op = None
        self.m = m
        self.n = n
        self.shift = False
        self.ncon = 0
        self.aves = None

    def set_up(self, op, eigenvectors, shift=False):
        self.op = op.op
        self.eigenvectors = eigenvectors
        self.shift = shift
        if shift:
            self.ones = op.ones
            self.aves = op.aves
            s = self.aves.dots(self.aves)
            vb = eigenvectors.new_vectors(1, self.m)
            self.op.apply(self.aves, vb)
            b = vb.data().reshape((self.m, 1)).real
            t = (self.norms * self.norms).reshape((self.m, 1))
            x = t - 2 * b + s.real * np.ones((self.m, 1))
            self.err = np.sqrt(abs(x))
        self.err_init = np.amax(self.err)
        self.err_init_f = nla.norm(self.err)

    def update_errors(self):
        ncon = self.eigenvectors.nvec()
        new = ncon - self.ncon
        if new > 0:
            err = self.err * self.err
            x = self.eigenvectors
            sel = x.selected()
            x.select(new, self.ncon)
            m, n = self.m, self.n
            if m < n:
                z = x.new_vectors(new, n)
                self.op.apply(x, z, transp=True)
                if self.shift:
                    s = x.dot(self.ones)
                    z.add(self.aves, -1, s)
                y = x.new_vectors(new, m)
                self.op.apply(z, y)
                if self.shift:
                    s = z.dot(self.aves)
                    y.add(self.ones, -1, s)
                q = x.dots(y, transp=True).real
                q[q < 0] = 0
            else:
                y = x.new_vectors(new, m)
                self.op.apply(x, y)
                if self.shift:
                    for _ in range(2):
                        s = y.dot(self.ones)
                        y.add(self.ones, -1.0 / m, s)
                q = y.dots(y, transp=True).real
            err -= q.reshape((m, 1))
            err[err < 0] = 0
            self.err = np.sqrt(err)
            x.select(sel[1], sel[0])
            self.ncon = ncon
        return self.err


class DefaultStoppingCriteria:
    """Stops when the truncation error in the chosen norm drops below the
    tolerance, a maximum count is reached, or — interactively — the user
    says stop (reference truncated_svd.py:205-283)."""

    def __init__(self, a, err_tol=0, norm='f', max_nsv=0, verb=0):
        self.shape = a.shape()
        self.scale = a.scale()
        self.err_tol = err_tol
        self.norm = norm
        self.max_nsv = max_nsv
        self.verb = verb
        self.ncon = 0
        self.sigma = 1
        self.iteration = 0
        self.start_time = time.time()
        self.elapsed_time = 0
        self.err_calc = TruncatedSVDErrorCalculator(a)
        self.norms = self.err_calc.norms
        self.max_norm = np.amax(self.norms)
        self.f_norm = math.sqrt(np.sum(self.norms * self.norms))
        self.f = 0

    def satisfied(self, solver):
        self.norms = self.err_calc.norms
        scale_max = self.err_calc.err_init
        scale_f = self.err_calc.err_init_f
        if solver.rcon <= self.ncon:
            return False
        new = solver.rcon - self.ncon
        lmd = solver.eigenvalues[self.ncon:solver.rcon]
        sigma = -np.sort(-np.sqrt(abs(lmd)))
        if self.ncon == 0:
            self.sigma = sigma[0]
            self.err = self.err_calc.err
            self.f = np.sum(self.err * self.err)
        i = new - 1
        si = sigma[i]
        si_rel = si / self.sigma
        if self.norm == 'm':
            self.err = self.err_calc.update_errors()
            err_abs = np.amax(self.err)
            err_rel = err_abs / scale_max
        elif self.norm == 'f':
            self.f -= np.sum(sigma * sigma)
            err_abs = math.sqrt(max(0, self.f))
            err_rel = err_abs / scale_f
        else:
            err_abs = si
            err_rel = si_rel
        self.elapsed_time += time.time() - self.start_time
        if self.norm in ('f', 'm'):
            msg = ('%.2f sec: sigma[%d] = %.2e*sigma[0], truncation error ='
                   ' %.2e' % (self.elapsed_time, self.ncon + i, si_rel,
                              err_rel))
        else:
            msg = ('%.2f sec: sigma[%d] = %e = %.2e*sigma[0]'
                   % (self.elapsed_time, self.ncon + i, si, si_rel))
        self.ncon = solver.rcon
        done = False
        if self.err_tol != 0:
            if self.verb > 0:
                print(msg)
            if self.err_tol > 0:
                done = err_rel <= self.err_tol
            else:
                done = err_abs <= abs(self.err_tol)
        elif self.max_nsv < 1:
            done = (input(msg + ', more? ') == 'n')
        elif self.verb > 0:
            print(msg)
        self.iteration = solver.iteration
        self.start_time = time.time()
        return done or (self.max_nsv > 0 and self.ncon >= self.max_nsv)


class DefaultProbe:
    """Interactive probe reporting truncation errors of the current
    approximation (reference truncated_svd.py:286-319)."""

    def __init__(self, data, shift):
        self.data = data
        self.shape = data.shape
        m = self.shape[0]
        n = int(np.prod(self.shape[1:]))
        data2d = data.reshape((m, n))
        t = nla.norm(data2d, axis=1).reshape((m, 1))
        if not shift:
            self.nrms = t.reshape((m,))
        else:
            mean = np.mean(data2d, axis=0).reshape((1, n))
            s = nla.norm(mean)
            b = (data2d @ mean.conj().T).real
            x = t * t - 2 * b + s * s * np.ones((m, 1))
            self.nrms = np.sqrt(abs(x)).reshape((m,))
        self.nsv = 0

    def inspect(self, mean, sigma, left, right):
        u = left * sigma[None, :]
        proj = nla.norm(u, axis=1)
        errs_sqr = self.nrms * self.nrms - proj * proj
        err_mx2 = math.sqrt(max(0.0, np.amax(errs_sqr))
                            / np.amax(self.nrms * self.nrms))
        err_fro = math.sqrt(max(0.0, np.sum(errs_sqr))
                            / np.sum(self.nrms * self.nrms))
        i = sigma.shape[0] - 1
        msg = ('sigma[%d] = %.1e*sigma[0], trunc. err. max 2: %.1e, fro:'
               ' %.1e' % (i, sigma[i] / sigma[0], err_mx2, err_fro))
        return input(msg + ', more? ') == 'n'


class UserStoppingCriteria:
    """Recomputes (U, Sigma) from the converged right vectors on every check
    and delegates the stop/continue decision to a probe
    (reference truncated_svd.py:322-385)."""

    def __init__(self, data, shift=False, probe=None):
        from ..algebra.dense_numpy import Matrix, Vectors

        self.shape = data.shape
        self.probe = probe if probe is not None else DefaultProbe(data, shift)
        m = self.shape[0]
        n = int(np.prod(self.shape[1:]))
        self.transpose = m < n
        self.data = np.reshape(data, (m, n))
        self.shift = shift
        self.matrix = Matrix(self.data)
        self.mean = np.mean(self.data, axis=0).reshape((1, n))
        dtype = data.dtype
        sigma_dtype = np.dtype(abs(self.data[0, 0])).type
        self.sigma = np.zeros((0,), dtype=sigma_dtype)
        self.left = Vectors(m, data_type=dtype)
        self.right = Vectors(n, data_type=dtype)
        self.ones = np.ones((1, m), dtype=dtype)
        self.__ones = Vectors(self.ones)
        self.__mean = Vectors(self.mean.astype(dtype))
        self.ncon = 0

    def satisfied(self, solver):
        new = solver.rcon - self.ncon
        if new < 1:
            return False
        eigenvectors = solver.eigenvectors.reference()
        eigenvectors.select(new, self.ncon)
        if self.transpose:
            v = self.left.new_vectors(new)
            u = self.right.new_vectors(new)
        else:
            v = self.right.new_vectors(new)
            u = self.left.new_vectors(new)
        v.fill(eigenvectors.data())
        self.matrix.apply(v, u, transp=self.transpose)
        if self.shift:
            if not self.transpose:
                s = v.dot(self.__mean)
                u.add(self.__ones, -1, s)
            else:
                s = v.dot(self.__ones)
                u.add(self.__mean, -1, s)
        sigma, q = u.svd()
        w = v.new_vectors(new)
        v.multiply(q, w)
        self.sigma = np.concatenate((self.sigma, sigma))
        if self.transpose:
            self.left.append(w)
            self.right.append(u)
        else:
            self.left.append(u)
            self.right.append(w)
        self.ncon += new
        return self.probe.inspect(self.mean, self.sigma,
                                  self.left.data().T, self.right.data().T)


class _DefaultSVDConvergenceCriteria:
    def __init__(self, tol):
        self.tolerance = tol

    def set_tolerance(self, tolerance):
        self.tolerance = tolerance

    def satisfied(self, solver, i):
        err = solver.convergence_data('kinematic vector error', i)
        return 0 <= err <= self.tolerance
