"""Backend selection and the architecture-aware dense-matrix wrapper.

Parity with the reference's ``dense_cpu.py`` try-import selector and
``AMatrix`` arch switch (raleigh/algebra/dense_cpu.py:10-17,
dense_matrix.py:10-64), re-targeted at TPUs:

  arch='cpu'           host NumPy algebra
  arch='tpu' / 'gpu'   JAX device algebra (TPU if present, else whatever
                       accelerator/CPU JAX is running on)
  arch='tpu!' / 'gpu!' JAX algebra, raise if no accelerator device exists
"""

import numpy as np

from ..utils import verbosity


def _have_accelerator():
    try:
        import jax
        return jax.devices()[0].platform not in ('cpu',)
    except Exception:
        return False


def best_backend(arch='tpu'):
    """Return (module, name) for the requested architecture string."""
    arch = str(arch).lower()
    want_device = arch.startswith(('tpu', 'gpu', 'jax'))
    must = arch.endswith('!')
    if want_device:
        if must and not _have_accelerator():
            raise RuntimeError('cannot use TPU: no accelerator device found')
        try:
            from . import dense_jax
            return dense_jax, 'jax'
        except Exception as e:  # pragma: no cover - jax is a hard dep
            if must:
                raise RuntimeError('cannot use TPU: %s' % e)
            if verbosity.level > 0:
                print('jax backend unavailable (%s), using numpy' % e)
    from . import dense_numpy
    return dense_numpy, 'numpy'


class AMatrix:
    """Architecture-aware wrap of a dense 2D array (reference
    raleigh/algebra/dense_matrix.py:10-64)."""

    def __init__(self, a, arch='cpu', copy_data=False, sharding=None):
        self.__arch = arch
        backend, name = best_backend(arch)
        self.__backend = backend
        self.__backend_name = name
        if name == 'jax':
            self.__op = backend.Matrix(a, sharding=sharding)
        else:
            self.__op = backend.Matrix(a.copy() if copy_data else a)
        self.__vectors = None
        self.__scale = float(np.max(np.abs(a)) if a.size else 0.0)

    def as_operator(self):
        return self.__op

    def as_vectors(self):
        if self.__vectors is None:
            self.__vectors = self.__backend.Vectors(self.__op, shallow=True)
        return self.__vectors

    def arch(self):
        return self.__arch

    def backend(self):
        return self.__backend

    def backend_name(self):
        return self.__backend_name

    def gpu(self):
        # reference API compat (dense_matrix.py:50): truthy when on device
        return None

    def dots(self):
        return self.__op.dots()

    def data_type(self):
        return self.__op.data_type()

    def shape(self):
        return self.__op.shape()

    def order(self):
        return self.__op.order()

    def scale(self):
        return self.__scale
