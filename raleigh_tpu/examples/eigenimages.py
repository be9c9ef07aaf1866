"""Eigenimages (LFW-class) PCA workload — the reference README's headline
dense benchmark (reference examples/eigenimages/compute_eigenimages.py and
icompute_eigenimages.py).

Usage:
    python -m raleigh_tpu.examples.eigenimages [npc] [data.npy|synthetic]
        [arch] [batch]

With 'synthetic' (default — the LFW download needs network access) a matrix
of the LFW eigenimages shape (12000 x 39375) with the reference generator's
k**-0.75 singular decay is synthesized on device.  Pass a .npy file of
shape (nimages, height*width) — e.g. the reference's converted
lfwdf_wmi_175x225_fa_12K.npy — to run on real data.  Results are saved to
eigenimages.npz (mean, trans, comps) for reuse, mirroring the reference's
numpy.savez persistence (compute_eigenimages.py:116-119).
"""

import sys
import time

import numpy as np


if __package__ in (None, ''):     # runnable as a plain script
    import os as _os
    import sys as _sys
    _sys.path.insert(0, _os.path.join(
        _os.path.dirname(_os.path.abspath(__file__)), '..', '..'))

def synthetic(m=12000, n=39375, rank=2048, seed=1):
    import jax
    import jax.numpy as jnp
    key = jax.random.PRNGKey(seed)
    ku, kv, kn = jax.random.split(key, 3)
    u = jax.random.normal(ku, (m, rank), dtype=jnp.float32)
    u = u.at[:, 0].set(1.0)
    v = jax.random.normal(kv, (rank, n), dtype=jnp.float32)
    s = jnp.arange(1, rank + 1, dtype=jnp.float32) ** -0.75
    a = (u * (s / jnp.sqrt(1.0 * m))) @ (v / jnp.sqrt(1.0 * n))
    a = a + 1e-4 * jax.random.normal(kn, (m, n), dtype=jnp.float32)
    return jax.block_until_ready(a)


def run(npc=800, source='synthetic', arch='tpu', batch=None, verb=0):
    from raleigh_tpu.interfaces.pca import pca

    if source == 'synthetic':
        data = synthetic()
    else:
        data = np.load(source, mmap_mode='r' if batch else None)
        m = data.shape[0]
        data = np.reshape(data, (m, -1))
    print('images: %s x %s' % (data.shape[0], data.shape[1]))

    start = time.time()
    mean, trans, comps = pca(data, npc=npc, batch_size=batch, arch=arch,
                             verb=verb)
    elapsed = time.time() - start
    print('%d eigenimages in %.1f s (%s)' % (comps.shape[0], elapsed, arch))
    np.savez('eigenimages', mean=mean, trans=trans, comps=comps)
    print('saved to eigenimages.npz')
    return elapsed


if __name__ == '__main__':
    a = sys.argv[1:]
    npc = int(a[0]) if a else 800
    source = a[1] if len(a) > 1 else 'synthetic'
    arch = a[2] if len(a) > 2 else 'tpu'
    batch = int(a[3]) if len(a) > 3 else None
    run(npc, source, arch, batch)
