from .dense import AMatrix, best_backend  # noqa: F401
