from . import kernels
from .kkt import (
    DenseCondensedKKT,
    DenseNormalKKT,
    DenseK2KKT,
    DenseK25KKT,
    make_kkt,
    kkt_mul,
)

__all__ = [
    "kernels",
    "DenseCondensedKKT",
    "DenseNormalKKT",
    "DenseK2KKT",
    "DenseK25KKT",
    "make_kkt",
    "kkt_mul",
]
