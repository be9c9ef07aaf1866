"""User-settable environment knobs.

Parity with reference raleigh/algebra/env.py:3 (`mkl_path`); here the knobs
select the JAX platform and the path of the native LDL^T shared library.
"""

# If not None, force this JAX platform ('tpu' or 'cpu') for the device algebra.
jax_platform = None

# If not None, path of the prebuilt native sparse-solver shared library.
native_lib_path = None
