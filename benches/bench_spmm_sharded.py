"""Sharded halo-exchange SpMM benchmark on a virtual device mesh.

Closes the "sharded SpMM benchmarked only by unit tests" gap: times the
row-partitioned ELL SpMM with ppermute halo exchange
(raleigh_tpu/parallel/spmm_sharded.py) on the 8-virtual-device CPU mesh
(the same environment the driver's dryrun uses; on a real pod the same
code lowers the halo exchange to ICI collective-permute).

Reports correctness vs scipy and the weak-scaling ratio against a
single-shard mesh of the same code path.

Usage: python benches/bench_spmm_sharded.py [nx] [m]   (default 48 64:
n=110,592 lap3d rows, block of 64 vectors)
"""
import os
import sys
import time

# this benchmark exercises the multi-shard code path: always the virtual
# CPU mesh (the driver's dryrun environment), overriding any platform
# preset (a single tunneled TPU cannot host an 8-way mesh).  jax may
# already be half-imported by a site hook, so the platform is forced via
# config update (env vars alone are too late), as tests/conftest.py does.
flags = os.environ.get('XLA_FLAGS', '')
if 'xla_force_host_platform_device_count' not in flags:
    os.environ['XLA_FLAGS'] = (
        flags + ' --xla_force_host_platform_device_count=8').strip()
os.environ['JAX_PLATFORMS'] = 'cpu'

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                '..'))

import numpy as np  # noqa: E402
import jax  # noqa: E402

jax.config.update('jax_platforms', 'cpu')


def run(mesh, a, xt, reps=20):
    from raleigh_tpu.parallel.spmm_sharded import ShardedEllMatrix
    sm = ShardedEllMatrix(a, mesh)
    y = jax.block_until_ready(sm.matmat_t(xt))          # compile + warm
    t0 = time.time()
    for _ in range(reps):
        y = jax.block_until_ready(sm.matmat_t(xt))
    dt = (time.time() - t0) / reps
    return np.asarray(y), dt, sm


def main():
    from raleigh_tpu.examples.laplace import lap3d
    from raleigh_tpu.parallel.mesh import make_mesh

    nx = int(sys.argv[1]) if len(sys.argv) > 1 else 48
    m = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    a = lap3d(nx, nx, nx, 1.0, 1.01, 1.02)
    n = a.shape[0]
    rng = np.random.default_rng(1)
    xt = rng.standard_normal((n, m)).astype(np.float32)
    print('n = %d, nnz = %d, block m = %d, devices = %d'
          % (n, a.nnz, m, len(jax.devices())))

    mesh8 = make_mesh()                 # all 8 virtual devices
    mesh1 = make_mesh(1)
    y8, t8, sm = run(mesh8, a, xt)
    y1, t1, _ = run(mesh1, a, xt)

    ref = a @ xt
    err = np.abs(y8 - ref).max() / np.abs(ref).max()
    # the virtual mesh timeshares the host cores, so wall-clock here is a
    # code-path check, not an ICI scaling measurement; the hardware-
    # relevant figure is the communication volume the halo exchange moves
    # per SpMM relative to the local stream
    local_gb = (sm.val.size * (4 + 4) + 2 * n * m * 4) / 1e9
    halo_gb = 2 * sm.halo * m * 4 * mesh8.shape['shards'] / 1e9 \
        if 'shards' in mesh8.shape else 2 * sm.halo * m * 4 * 8 / 1e9
    print('sharded(8): %.2f ms   sharded(1): %.2f ms  [virtual mesh]'
          % (t8 * 1e3, t1 * 1e3))
    print('halo: %d of %d rows/shard -> %.4f GB exchanged vs %.3f GB local'
          ' (%.1f%%)' % (sm.halo, sm.chunk, halo_gb, local_gb,
                         100 * halo_gb / local_gb))
    print('rel err vs scipy: %.2e' % err)
    assert err < 1e-5


if __name__ == '__main__':
    main()
