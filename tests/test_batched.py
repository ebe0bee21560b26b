"""Batched small-QR (shifted CholeskyQR3 over a stack)."""

import numpy as np
import jax.numpy as jnp
import pytest

from cuda_qr_tpu.models.batched import qr_batched
from cuda_qr_tpu.utils.config import QRConfig
from cuda_qr_tpu.utils.errors import QRShapeError


@pytest.fixture
def rng():
    return np.random.default_rng(5)


def _check_stack(Q, R, A, tol):
    Q, R, A = map(np.asarray, (Q, R, A))
    B = Q.reshape((-1,) + Q.shape[-2:])
    Rf = R.reshape((-1,) + R.shape[-2:])
    Af = A.reshape((-1,) + A.shape[-2:])
    for q, r, a in zip(B, Rf, Af):
        resid = np.linalg.norm(q @ r - a) / max(np.linalg.norm(a), 1e-30)
        orth = np.linalg.norm(q.T @ q - np.eye(q.shape[1]))
        assert resid < tol, f"residual {resid:.3e}"
        assert orth < tol, f"orthogonality {orth:.3e}"
        assert np.allclose(r, np.triu(r), atol=tol), "R not triangular"
        assert (np.diagonal(r) > 0).all(), "R diagonal not positive"


@pytest.mark.parametrize("shape", [(4, 32, 8), (7, 65, 17), (2, 3, 128, 24)])
def test_batched_random(rng, shape):
    A = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
    Q, R = qr_batched(A)
    assert Q.shape == shape and R.shape == shape[:-2] + (shape[-1], shape[-1])
    _check_stack(Q, R, A, 1e-4)


def test_batched_matches_numpy_r(rng):
    A = rng.standard_normal((5, 40, 12)).astype(np.float32)
    R = qr_batched(jnp.asarray(A), mode="r")
    for a, r in zip(A, np.asarray(R)):
        rn = np.linalg.qr(a, mode="r")
        # both upper triangular; ours has positive diagonal, numpy's signs
        # vary -- compare after normalizing row signs
        s = np.sign(np.diagonal(rn))
        assert np.allclose(s[:, None] * rn, r, atol=1e-3), "R mismatch"


def test_batched_ill_conditioned_triggers_round3(rng):
    """cond ~ 1e5 in fp32: CholeskyQR2 alone leaves orthogonality ~1e-2;
    the gated third round must recover O(eps)."""
    m, n, b = 96, 16, 3
    U, _ = np.linalg.qr(rng.standard_normal((b, m, n)))
    V, _ = np.linalg.qr(rng.standard_normal((b, n, n)))
    sv = np.logspace(0, -5, n)
    A = (U * sv[None, None, :]) @ np.transpose(V, (0, 2, 1))
    Q, R = qr_batched(jnp.asarray(A.astype(np.float32)))
    _check_stack(Q, R, A.astype(np.float32), 2e-4)


def test_batched_float64(rng):
    A = jnp.asarray(rng.standard_normal((3, 50, 10)))
    if A.dtype != jnp.float64:
        pytest.skip("x64 disabled")
    Q, R = qr_batched(A)
    _check_stack(Q, R, A, 1e-12)


def test_batched_rank_deficient_nans(rng):
    """Exactly singular elements yield NaNs (detectable), never a silently
    wrong factorization."""
    A = rng.standard_normal((2, 24, 6)).astype(np.float32)
    A[1, :, 3] = A[1, :, 2]  # duplicate column
    Q, R = qr_batched(jnp.asarray(A))
    q0, r0 = np.asarray(Q[0]), np.asarray(R[0])
    assert np.isfinite(q0).all()
    resid = np.linalg.norm(q0 @ r0 - A[0]) / np.linalg.norm(A[0])
    assert resid < 1e-4
    bad = ~np.isfinite(np.asarray(Q[1])) | ~np.isfinite(np.asarray(Q[1]))
    ok1 = np.isfinite(np.asarray(Q[1])).all() and np.isfinite(
        np.asarray(R[1])).all()
    if ok1:  # the shift can rescue near-singular elements; then it must
        # actually be correct
        q1, r1 = np.asarray(Q[1]), np.asarray(R[1])
        resid1 = np.linalg.norm(q1 @ r1 - A[1]) / np.linalg.norm(A[1])
        orth1 = np.linalg.norm(q1.T @ q1 - np.eye(6))
        assert resid1 < 1e-3 and orth1 < 1e-3
    else:
        assert bad.any()


def test_batched_shape_errors(rng):
    with pytest.raises(QRShapeError):
        qr_batched(jnp.zeros((4, 8, 16)))  # m < n
    with pytest.raises(QRShapeError):
        qr_batched(jnp.zeros((5,)))
    with pytest.raises(QRShapeError):
        qr_batched(jnp.zeros((2, 8, 4), jnp.complex64))


def test_batched_single_matrix(rng):
    """No batch dims at all: (m, n) works and matches the stack semantics."""
    A = jnp.asarray(rng.standard_normal((30, 7)).astype(np.float32))
    Q, R = qr_batched(A)
    assert Q.shape == (30, 7) and R.shape == (7, 7)
    _check_stack(Q[None], R[None], A[None], 1e-4)


def test_batched_gradient():
    """qr_batched shares the thin-QR VJP (vmapped); matches per-element
    qr() gradients under a sign/convention-invariant loss."""
    import jax
    from cuda_qr_tpu.models.qr import qr
    rng = np.random.default_rng(11)
    A = jnp.asarray(rng.standard_normal((3, 20, 5)))
    cfg = QRConfig(panel_width=8, use_pallas=False, dtype=jnp.float64)
    w = jnp.arange(5.0)

    def loss_b(a):
        Q, R = qr_batched(a)
        return jnp.sum(Q ** 2 * w) + jnp.sum(R ** 2)

    def loss_q(a):
        out = 0.0
        for i in range(3):
            Q, R = qr(a[i], cfg)
            out = out + jnp.sum(Q ** 2 * w) + jnp.sum(R ** 2)
        return out

    g_b = jax.grad(loss_b)(A)
    g_q = jax.grad(loss_q)(A)
    assert bool(jnp.all(jnp.isfinite(g_b)))
    assert float(jnp.max(jnp.abs(g_b - g_q))) < 1e-7
