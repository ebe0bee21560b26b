"""cuda_qr_tpu: a TPU-native blocked-Householder QR factorization library.

Built from scratch with the capabilities of the CUDA research prototype
brian-kelley/CUDA-QR (MMQR) -- see SURVEY.md for the structural map and
BASELINE.md for the reference's numbers.  Compute path: JAX/XLA with Pallas
kernels for the panel factorization; runtime verification against a native
C99 oracle implementing the reference's sliding-panel algorithm.
"""

from .models.batched import qr_batched
from .models.caqr import caqr, caqr_r
from .models.decomp import lq, ql, qr_multiply, rq
from .models.eigh import eigh, eigh_batched
from .models.lstsq import LstsqResult, lstsq, lstsq_dist, solve
from .models.polar import polar, polar_dist, svd, svd_dist
from .models.qr import qr, qr_factor, qr_pivoted, QRResult
from .models.rank import lstsq_rr, matrix_rank, null_space, pinv, slogdet
from .models.rsvd import (cond_est, eigh_rand, eigh_rand_dist, norm2_est,
                          orth, rsvd, rsvd_dist)
from .models.tsqr import tsqr, tsqr_r
from .models.update import (qr_col_delete, qr_col_insert, qr_rank1_update,
                            qr_row_delete, qr_row_insert, qr_update)
from .ops.blocked import PackedQR, extract_r, orgqr, ormqr, qr_blocked
from .ops.householder import geqr2, larfb, larft, make_reflector, unpack_r, unpack_v
from .parallel.caqr import caqr_ormqr
from .parallel.mesh import row_mesh, row_sharding
from .parallel.tsqr_dist import tsqr_dist
from .utils.config import DEFAULT_CONFIG, MIXED_CONFIG, QRConfig
from .utils.errors import QRError, QRNumericalError, QRShapeError
from .utils.hostio import to_device, to_host
from .utils.verify import QRCheck, check_qr

__version__ = "0.3.0"

__all__ = [
    "qr", "qr_factor", "qr_pivoted", "QRResult", "PackedQR", "qr_blocked", "orgqr", "ormqr",
    "extract_r", "geqr2", "larfb", "larft", "make_reflector", "unpack_r",
    "unpack_v", "QRConfig", "DEFAULT_CONFIG", "MIXED_CONFIG", "QRCheck",
    "check_qr", "qr_batched", "qr_update", "qr_rank1_update", "qr_row_insert",
    "qr_row_delete", "qr_col_insert", "qr_col_delete",
    "tsqr", "tsqr_r", "tsqr_dist", "caqr", "caqr_r", "caqr_ormqr",
    "lstsq", "lstsq_dist", "solve", "LstsqResult",
    "matrix_rank", "pinv", "null_space", "lstsq_rr", "slogdet",
    "lq", "rq", "ql", "qr_multiply", "orth", "rsvd", "rsvd_dist",
    "eigh", "eigh_batched", "eigh_rand", "eigh_rand_dist", "norm2_est", "cond_est",
    "polar", "polar_dist", "svd", "svd_dist",
    "row_mesh", "row_sharding", "QRError", "QRShapeError", "QRNumericalError",
    "to_device", "to_host",
]
