from .mesh import make_mesh, blockvec_sharding, matrix_sharding, AXIS  # noqa: F401
