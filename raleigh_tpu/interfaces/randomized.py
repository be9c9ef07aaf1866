"""Device-resident randomized/subspace PCA and SVD engines.

The block Jacobi-CG engine (interfaces/partial_svd.py) is the high-accuracy
path with per-singular-triplet convergence control, but its adaptive logic
lives on the host.  This module is the opposite trade: the entire
computation — implicit Gram operator, subspace iteration with Cholesky-QR
re-orthonormalization, Rayleigh-Ritz — is a single jitted XLA program, so
a full PCA costs one device round-trip.  This is the engine to use on
remote/high-latency accelerators and for bulk "give me k components"
workloads; its accuracy target is the truncation error of the
approximation (near-optimal with modest oversampling and a few power
iterations), not per-vector tolerances.

No counterpart exists in the reference (it is TPU-native added value), but
it fulfils the same pca() contract (reference interfaces/pca.py:16-99).
"""

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=('npc', 'oversample', 'iters'))
def _subspace_pca_gram(a, key, npc, oversample, iters):
    """PCA via subspace iteration on the implicit centered Gram matrix
    G = As As^T (As = A - e mean), fully on device.

    Returns (mean (n,), trans (m, npc), comps (npc, n), sigma (npc,)).
    """
    m, n = a.shape
    dt = a.dtype
    f32 = jnp.float32 if dt != jnp.float64 else jnp.float64
    hi = jax.lax.Precision.HIGHEST
    mean = jnp.mean(a, axis=0)                       # (n,)
    r = jnp.matmul(a, mean, precision=hi)            # (m,)
    mu2 = jnp.dot(mean, mean, precision=hi)
    # G = A A^T - r e^T - e r^T + mu2 e e^T  (never materializes As).
    # HIGHEST precision throughout: the Gram route squares the spectrum,
    # and bf16 operand truncation would bury the trailing sigma^2
    G = jnp.matmul(a, a.T, preferred_element_type=f32, precision=hi)
    G = G - r[:, None] - r[None, :] + mu2

    l = min(npc + oversample, m)
    q = jax.random.normal(key, (m, l), dtype=f32)

    def body(_, q):
        y = jnp.matmul(G, q, preferred_element_type=f32, precision=hi)
        # Householder QR re-orthonormalization: the Gram route squares the
        # (already squared) spectrum and overruns f32
        q, _ = jnp.linalg.qr(y)
        return q

    q = jax.lax.fori_loop(0, iters, body, body(0, q))
    # Rayleigh-Ritz on the l-dimensional subspace
    s = jnp.matmul(q.T, jnp.matmul(G, q, preferred_element_type=f32,
                                  precision=hi),
                   preferred_element_type=f32, precision=hi)
    s = 0.5 * (s + s.T)
    lmd, w = jnp.linalg.eigh(s)                      # ascending
    lmd = lmd[::-1][:npc]
    w = w[:, ::-1][:, :npc]
    u = jnp.matmul(q, w, preferred_element_type=f32, precision=hi)
    sigma = jnp.sqrt(jnp.maximum(lmd, 0.0))
    # right factors: comps = (As^T u / sigma)^T, again without As
    atu = jnp.matmul(a.T, u, preferred_element_type=f32, precision=hi)
    atu = atu - mean[:, None] * jnp.sum(u, axis=0)[None, :]
    inv = 1.0 / jnp.maximum(sigma, jnp.finfo(f32).tiny ** 0.5)
    comps = (atu * inv[None, :]).T                   # (npc, n)
    trans = u * sigma[None, :]                       # (m, npc)
    return mean, trans.astype(dt), comps.astype(dt), sigma


def subspace_pca(a, npc, oversample=64, iters=6, seed=1, fetch=True):
    """One-round-trip PCA: returns (mean (1, n), trans (m, npc),
    comps (npc, n)) like interfaces.pca.pca.

    With ``fetch=False`` the factors are returned as device arrays
    (computation completed via block_until_ready) for on-device
    consumers — no host transfer."""
    a = jnp.asarray(a)
    key = jax.random.PRNGKey(seed)
    mean, trans, comps, sigma = _subspace_pca_gram(
        a, key, int(npc), int(oversample), int(iters))
    if not fetch:
        jax.block_until_ready((mean, trans, comps))
        return mean.reshape(1, -1), trans, comps
    mean, trans, comps = jax.device_get((mean, trans, comps))
    return np.asarray(mean).reshape(1, -1), np.asarray(trans), \
        np.asarray(comps)


def randomized_svd(a, k, oversample=16, iters=4, seed=1):
    """Randomized truncated SVD (Halko-Martinsson-Tropp style) as one
    jitted program: returns (u, sigma, vt)."""
    a = jnp.asarray(a)
    u, s, vt = _rand_svd(a, jax.random.PRNGKey(seed), int(k),
                         int(oversample), int(iters))
    u, s, vt = jax.device_get((u, s, vt))
    return np.asarray(u), np.asarray(s), np.asarray(vt)


@partial(jax.jit, static_argnames=('k', 'oversample', 'iters'))
def _rand_svd(a, key, k, oversample, iters):
    m, n = a.shape
    f32 = jnp.float32 if a.dtype != jnp.float64 else jnp.float64
    l = min(k + oversample, min(m, n))
    q = jax.random.normal(key, (n, l), dtype=a.dtype)
    q = jnp.matmul(a, q, preferred_element_type=f32)

    def body(_, q):
        q, _ = jnp.linalg.qr(q)
        q = jnp.matmul(a, jnp.matmul(a.T, q, preferred_element_type=f32),
                       preferred_element_type=f32)
        return q

    q = jax.lax.fori_loop(0, iters, body, q)
    q, _ = jnp.linalg.qr(q)
    b = jnp.matmul(q.T, a, preferred_element_type=f32)     # (l, n)
    ub, s, vt = jnp.linalg.svd(b, full_matrices=False)
    u = jnp.matmul(q, ub, preferred_element_type=f32)
    return u[:, :k].astype(a.dtype), s[:k], vt[:k].astype(a.dtype)
