"""Device-resident preconditioned block eigensolver (LOBPCG family).

The reference-parity ``core.solver.Solver`` orchestrates its block
Jacobi-conjugated-gradients iteration from the host: adaptive block
rebalancing, per-vector convergence sweeps, cluster/stagnation logic
(reference raleigh/core/solver.py:587-1663).  That control flow is worth
keeping for parity, but on a remote accelerator every one of its ~10 small
device calls per iteration costs a dispatch round-trip.

This module is the TPU-native counterpart: the *entire* iteration — SpMM,
polynomial preconditioning, constraint orthogonalization, Gram matrices,
the Rayleigh–Ritz eigenproblem (on-device ``jnp.linalg.eigh`` of a
(3m x 3m) matrix), basis update and residual norms — is ONE jitted XLA
program, and ``chunk`` iterations run per dispatch inside a
``lax.fori_loop``.  The host sees only an (m,) eigenvalue and residual
vector every ``chunk`` iterations to decide termination.  This is the
"jit-compatible re-implementation of the block CG core" SURVEY §7 calls
for, in its locally-optimal-block (LOBPCG) formulation, which maps every
hot op onto the MXU.

Algorithm: classical LOBPCG with hierarchical block orthonormalization
(X ⊥ W ⊥ P by blocked two-pass Gram–Schmidt, per-block eigh-whitening with
dead-column masking for float32 robustness) and Rayleigh–Ritz over
span[X, W, P].  The preconditioner is any jit-traceable (n, m) -> (n, m)
map — e.g. the fused Chebyshev recurrence (algebra/sparse.py) whose
SpMMs inline into the same XLA program.
"""

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

_HI = jax.lax.Precision.HIGHEST


def _gram(a, b):
    return jnp.matmul(a.conj().T, b, precision=_HI)


def _normalize_drop(block, sqrt_eps, dead0=None):
    """Normalize columns to unit length; a column whose norm collapsed
    below sqrt(eps) relative to the block's largest column is pure
    rounding noise (e.g. the residual of a converged pair, or a direction
    swallowed by an orthogonalization) — zero it and flag it dead.

    This *scale-referenced* deadness test is what keeps the iteration
    stable after convergence: a Gram-relative cutoff alone cannot tell a
    noise block from a live one (its Gram matrix has 100% rounding error
    but a perfectly fine condition number), and whitening such a block
    manufactures columns of norm >> 1 that destroy the basis."""
    norms = jnp.linalg.norm(block, axis=0)
    ref = jnp.maximum(jnp.max(norms), 1e-30)
    dead = norms <= sqrt_eps * ref
    if dead0 is not None:
        dead = dead | dead0
    safe = jnp.where(norms == 0, 1.0, norms)
    return jnp.where(dead[None, :], 0.0, block / safe[None, :]), dead


def _whiten(block, eps_rel, sqrt_eps, dead0=None):
    """Orthonormalize the columns of ``block`` (unit-normalized, possibly
    with zeroed dead columns) by eigh-whitening of its Gram matrix;
    near-dependent directions are zeroed and flagged.

    Returns (orthonormal block with dead columns = 0, dead mask (m,))."""
    g = _gram(block, block)
    w, v = jnp.linalg.eigh(g)              # ascending, w >= 0 up to noise
    wmax = jnp.maximum(w[-1], 0.0)
    cutoff = wmax * eps_rel
    dead_g = w <= cutoff
    inv = jnp.where(dead_g, 0.0, 1.0 / jnp.sqrt(jnp.where(dead_g, 1.0, w)))
    bw = jnp.matmul(block, v * inv[None, :], precision=_HI)
    # a correctly whitened column is unit up to rounding; anything that
    # is not was noise-dominated — run the scale test once more
    return _normalize_drop(bw, sqrt_eps, dead0)


def _ortho_against(block, basis):
    """Two-pass classical Gram-Schmidt of ``block`` against the
    orthonormal ``basis`` (two passes restore orthogonality lost to
    float32 rounding)."""
    for _ in range(2):
        block = block - jnp.matmul(basis, _gram(basis, block),
                                   precision=_HI)
    return block


def shard_operator(dm, mesh, axis='chips'):
    """Place a device sparse matrix's payload so the LOBPCG iteration
    shards over the vector dimension of ``mesh``: XLA's GSPMD partitioner
    then turns the DIA shifts into collective-permutes at shard
    boundaries, the ELL gathers into local gathers + all-to-all where
    needed, and every Gram matrix into a local matmul + psum — the
    sharded-Vectors design of SURVEY §5.8 with zero solver changes."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    if hasattr(dm, 'val') and dm.val.ndim == 2:      # DIA: (noff, n)
        dm.val = jax.device_put(dm.val, NamedSharding(mesh, P(None, axis)))
    elif hasattr(dm, 'idx'):                         # ELL: (n, K)
        dm.idx = jax.device_put(dm.idx, NamedSharding(mesh, P(axis, None)))
        dm.val = jax.device_put(dm.val, NamedSharding(mesh, P(axis, None)))
    return dm


def lobpcg(op, k, n=None, precond=None, block_size=None, tol=1e-4,
           maxit=500, chunk=16, largest=False, x0=None, seed=1,
           dtype=np.float32, verb=0, sharding=None):
    """Compute the ``k`` algebraically smallest (or largest) eigenpairs of
    a symmetric positive (semi-)definite operator entirely on device.

    Parameters
    ----------
    op : object with ``matmat_t((n, m)) -> (n, m)`` (a device sparse
        matrix from ops/spmm.py) or a jit-traceable callable.
    k : number of wanted eigenpairs.
    n : problem dimension (required when ``op`` is a bare callable).
    precond : jit-traceable (n, m) -> (n, m) approximate inverse applied
        to the residual block (e.g. ``Chebyshev._device_fused()``), or
        None.
    block_size : iteration block m >= k (default: k + max(8, k//4)).
    tol : convergence on ||A x - lmd x|| <= tol * anorm_est per wanted
        pair, anorm_est = running max |lmd| (scipy.lobpcg convention).
    chunk : device iterations per host dispatch (larger amortizes the
        dispatch latency of remote/tunneled devices).
    x0 : optional (n, >=m) initial guess block.
    sharding : optional jax.sharding.Sharding for the (n, m) iteration
        blocks (vector dimension sharded over the mesh); pair it with
        ``shard_operator`` so GSPMD partitions the whole superkernel.

    Returns (lmd (k,), x (n, k), resid (k,), niter, status) with status
    0 = converged, 2 = iteration limit (solver status convention,
    reference core/solver.py:305-331).
    """
    matmat0 = op.matmat_t if hasattr(op, 'matmat_t') else op

    def matmat(v):
        # the operator (and preconditioner) may hold values in a different
        # precision; the iteration dtype is authoritative for the carries
        return matmat0(v).astype(v.dtype)
    if n is None:
        n = op.shape[0]
    m = block_size or min(n, k + max(8, k // 4))
    if m < k:
        raise ValueError('block_size < k')
    eps = float(np.finfo(np.dtype(dtype).type(0).real.dtype).eps)
    eps_rel = 100 * eps
    sqrt_eps = float(np.sqrt(eps))
    sign = -1.0 if largest else 1.0

    if precond is None:
        def precond(w):
            return w

    @partial(jax.jit, static_argnames=('iters',))
    def run(x, ax, p, ap, anorm, iters):
        def body(_, state):
            x, ax, p, ap, anorm = state
            lam = jnp.einsum('nm,nm->m', x.conj(), ax,
                             precision=_HI).real
            anorm = jnp.maximum(anorm, jnp.max(jnp.abs(lam)))
            w = ax - x * lam[None, :]
            w = precond(w).astype(w.dtype)
            # hierarchical orthonormalization: X is orthonormal; W ⊥ X;
            # P ⊥ X, W.  Dead (noise or rank-deficient) columns are
            # zeroed and masked out of the Rayleigh-Ritz selection.
            w, dead_w = _normalize_drop(w, sqrt_eps)
            w = _ortho_against(w, x)
            w, dead_w = _normalize_drop(w, sqrt_eps, dead_w)
            w, dead_w = _whiten(w, eps_rel, sqrt_eps, dead_w)
            p, dead_p = _normalize_drop(p, sqrt_eps)
            p = _ortho_against(p, x)
            p = _ortho_against(p, w)
            p, dead_p = _normalize_drop(p, sqrt_eps, dead_p)
            p, dead_p = _whiten(p, eps_rel, sqrt_eps, dead_p)
            aw = matmat(w)
            # A-images transform linearly under the (dense, small)
            # orthonormalization maps, but recomputing them via one SpMM
            # on the final W keeps the program simpler; P's image is
            # tracked exactly through the Ritz update below, so only W
            # costs an operator application per iteration... P changed
            # under ortho though, so recompute its image too.
            ap = matmat(p)
            s = jnp.concatenate((x, w, p), axis=1)
            a_s = jnp.concatenate((ax, aw, ap), axis=1)
            h = _gram(s, a_s)
            h = 0.5 * (h + h.conj().T) * sign
            dead = jnp.concatenate(
                (jnp.zeros((m,), bool), dead_w, dead_p))
            # push dead (zeroed) basis columns past the live spectrum so
            # the Ritz selection never picks them; keep the offset within
            # float32 eigh's comfortable range
            big = (jnp.max(jnp.abs(jnp.diagonal(h))) + 1.0) * 1e4
            h = h + jnp.diag(jnp.where(dead, big, 0.0).astype(h.dtype))
            vals, c = jnp.linalg.eigh(h)
            cm = c[:, :m]
            xn = jnp.matmul(s, cm, precision=_HI)
            axn = jnp.matmul(a_s, cm, precision=_HI)
            # conjugate directions: the W/P components of the update
            cwp = cm.at[:m, :].set(0)
            pn = jnp.matmul(s, cwp, precision=_HI)
            apn = jnp.matmul(a_s, cwp, precision=_HI)
            return xn, axn, pn, apn, anorm

        x, ax, p, ap, anorm = jax.lax.fori_loop(
            0, iters, body, (x, ax, p, ap, anorm))
        lam = jnp.einsum('nm,nm->m', x.conj(), ax,
                         precision=_HI).real
        anorm = jnp.maximum(anorm, jnp.max(jnp.abs(lam)))
        r = ax - x * lam[None, :]
        resid = jnp.linalg.norm(r, axis=0)
        order = jnp.argsort(sign * lam)
        return x[:, order], ax[:, order], p, ap, anorm, lam[order], \
            resid[order]

    # ---- initial block -----------------------------------------------
    if x0 is not None:
        x = jnp.asarray(x0, dtype=dtype)[:, :m]
        if x.shape[1] < m:
            key = jax.random.PRNGKey(seed)
            x = jnp.concatenate(
                (x, jax.random.normal(key, (n, m - x.shape[1]), dtype)),
                axis=1)
    else:
        x = jax.random.normal(jax.random.PRNGKey(seed), (n, m), dtype)
    if sharding is not None:
        x = jax.device_put(x, sharding)
    x, _ = _whiten(x, eps_rel, sqrt_eps)
    ax = matmat(x)
    p = jnp.zeros_like(x)
    ap = jnp.zeros_like(x)
    anorm = jnp.zeros((), jnp.float32 if np.dtype(dtype).itemsize < 8
                      else jnp.float64)

    niter = 0
    status = 2
    lam = resid = None
    while niter < maxit:
        iters = min(chunk, maxit - niter)
        x, ax, p, ap, anorm, lam, resid = run(x, ax, p, ap, anorm, iters)
        niter += iters
        lam_h, resid_h, anorm_h = jax.device_get((lam, resid, anorm))
        if verb > 0:
            print('iter %4d: lmd[:%d] %s, resid %s' % (
                niter, min(k, 4), np.round(lam_h[:min(k, 4)], 6),
                np.format_float_scientific(resid_h[:k].max(), 2)))
        if np.all(resid_h[:k] <= tol * max(anorm_h, 1e-30)):
            status = 0
            break
    return (np.asarray(lam_h[:k]), np.asarray(x[:, :k]),
            np.asarray(resid_h[:k]), niter, status)
