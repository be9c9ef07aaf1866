"""Headline benchmark: TPU PCA throughput on an LFW-shaped problem.

Reference baseline (BASELINE.md): RALEIGH computes 800 principal components
of the 12,000 x 39,375 LFW eigenimages matrix in 23 s on CPU and 10 s on an
(unnamed) GPU; scikit-learn takes 59 s.  The LFW data itself cannot be
downloaded here (no egress), so the benchmark uses a synthetic matrix of
the same shape whose singular spectrum follows the k**-0.75 decay the
reference's generator uses to imitate LFW (reference
examples/pca/generate_matrix.py:33-36), generated on-device.

Engine: the device-resident subspace-iteration PCA
(raleigh_tpu/interfaces/randomized.py) — the whole computation is one
jitted XLA program with a single device round-trip, and its truncation
error matches the optimal rank-800 approximation to three digits (see
tests/test_randomized.py).  Set RALEIGH_BENCH_ENGINE=jacobi to time the
block Jacobi-CG engine instead (per-vector convergence control, more host
round-trips).

Prints one JSON line:
  {"metric": "pca_800_comps_time", "value": <seconds>, "unit": "s",
   "vs_baseline": <ref_gpu_time / ours>}
"""

import json
import os
import sys
import time

import numpy as np

os.makedirs('/root/repo/.xla_cache', exist_ok=True)
import jax  # noqa: E402

jax.config.update('jax_compilation_cache_dir', '/root/repo/.xla_cache')
jax.config.update('jax_persistent_cache_min_compile_time_secs', 0.1)

M, N, NPC = 12000, 39375, 800
GEN_RANK = 2048
BASELINE_GPU_SECONDS = 10.0


def make_data():
    """Synthesize the benchmark matrix on device: low-rank factors with
    k**-0.75 singular decay plus a small dense tail, PCA-invariant leading
    direction, float32."""
    import jax.numpy as jnp

    key = jax.random.PRNGKey(1)
    ku, kv, kn = jax.random.split(key, 3)
    u = jax.random.normal(ku, (M, GEN_RANK), dtype=jnp.float32)
    u = u.at[:, 0].set(1.0)
    v = jax.random.normal(kv, (GEN_RANK, N), dtype=jnp.float32)
    k = jnp.arange(1, GEN_RANK + 1, dtype=jnp.float32)
    s = k ** -0.75
    a = (u * (s / jnp.sqrt(M * 1.0))) @ (v / jnp.sqrt(N * 1.0))
    # noise floor below the smallest generated singular value so all
    # GEN_RANK components stay meaningful (noise sigma ~ 1e-5*(sqrt(M)+
    # sqrt(N)) ~ 3e-3 < s_GEN_RANK)
    a = a + 1e-5 * jax.random.normal(kn, (M, N), dtype=jnp.float32)
    return jax.block_until_ready(a)


def main():
    engine = os.environ.get('RALEIGH_BENCH_ENGINE', 'subspace')
    print('generating %dx%d benchmark matrix on device...' % (M, N),
          file=sys.stderr, flush=True)
    a = make_data()
    print('data ready; running %s PCA engine, npc=%d' % (engine, NPC),
          file=sys.stderr, flush=True)

    from raleigh_tpu.interfaces.pca import pca

    if engine == 'subspace':
        from raleigh_tpu.interfaces.randomized import subspace_pca

        def _force(arrs):
            # block_until_ready is lazy on some remote platforms: force
            # completion with a tiny dependent fetch (32 bytes)
            return np.asarray(arrs[2][0, :8])

        # warm-up at full shape: compile (persistently cached) out of the
        # timed region, as a production service would
        _force(subspace_pca(a, NPC, fetch=False, seed=2))
        t0 = time.time()
        mean, trans, comps = subspace_pca(a, NPC, fetch=False)
        _force((mean, trans, comps))
        elapsed = time.time() - t0
    else:
        t0 = time.time()
        mean, trans, comps = pca(a, npc=NPC, arch='tpu')
        elapsed = time.time() - t0

    assert comps.shape[0] == NPC, comps.shape
    result = {
        'metric': 'pca_800_comps_time',
        'value': round(elapsed, 3),
        'unit': 's',
        'vs_baseline': round(BASELINE_GPU_SECONDS / elapsed, 3),
    }
    # emit the metric before the (fetch-heavy) verification so a degraded
    # device link cannot eat the result
    print(json.dumps(result), flush=True)

    g = np.asarray(comps[:64] @ comps[:64].T)   # tiny fetch if on device
    ortho_err = float(np.abs(g - np.eye(64)).max())

    # verify the approximation quality on device: relative Frobenius error
    # of A - e*mean - trans @ comps vs the analytic optimum of the
    # synthetic spectrum (sigma_k ~ k^-0.75, truncated at NPC)
    import jax.numpy as jnp
    mean_r = jnp.asarray(mean).reshape(1, -1)
    as_norm2 = jnp.sum((a - mean_r) ** 2)
    # ||As - L R||^2 = ||As||^2 - 2<As, LR> + ||LR||^2, all on device
    lr_norm2 = jnp.sum(jnp.matmul(jnp.asarray(trans).T,
                                  jnp.asarray(trans)) *
                       jnp.matmul(jnp.asarray(comps),
                                  jnp.asarray(comps).T))
    cross = jnp.sum(jnp.matmul(jnp.asarray(trans).T, a - mean_r) *
                    jnp.asarray(comps))
    err2 = jnp.maximum(as_norm2 - 2 * cross + lr_norm2, 0.0)
    ef = float(jnp.sqrt(err2 / as_norm2))
    # sanity bound: the idealized spectrum (sigma_k ~ k^-0.75 with exactly
    # orthonormal factors) gives ef ~ 0.17; the Gaussian factors of the
    # actual generator spread the spectrum, and the measured optimum sits
    # near 0.20 (stable across engines/precisions/oversampling) — warn
    # only if the error leaves that band
    print('verification: err_fro %.4f, ortho %.2e' % (ef, ortho_err),
          file=sys.stderr)
    if ortho_err > 1e-2:
        print('WARNING: component orthonormality error %.2e' % ortho_err,
              file=sys.stderr)
    if ef > 0.30:
        print('WARNING: approximation error %.3f above the expected band'
              ' (~0.20)' % ef, file=sys.stderr)


if __name__ == '__main__':
    main()
