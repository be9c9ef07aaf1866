"""Device-mesh and sharding helpers for the block-vector algebra.

The single scaling axis of this domain is the vector dimension ``n`` (the
problem size): block vectors are ``(m, n)`` arrays sharded over the mesh
along ``n`` (PartitionSpec(None, 'shards')).  Under ``jit`` XLA's SPMD
partitioner then turns every Gram/``dot`` contraction into a local GEMM
followed by a psum over ICI, and leaves linear combinations local — the
TPU equivalent of the "MPI Vectors" extension point the reference names at
core/solver.py:98-102.
"""

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

AXIS = 'shards'


def make_mesh(n_devices=None, devices=None):
    """A 1-D mesh over ``n_devices`` (default: all available)."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (AXIS,))


def blockvec_sharding(mesh):
    """Sharding for (m, n) block-vector storage: split the vector dim."""
    return NamedSharding(mesh, P(None, AXIS))


def matrix_sharding(mesh):
    """Sharding for a dense (rows, features) data matrix: split features so
    operator applications contract over the sharded axis (psum over ICI)."""
    return NamedSharding(mesh, P(None, AXIS))


def replicated(mesh):
    return NamedSharding(mesh, P())
