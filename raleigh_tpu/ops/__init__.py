from .spmm import EllMatrix, BsrMatrix, device_sparse  # noqa: F401
