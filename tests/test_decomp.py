"""LQ / RQ / QL / qr_multiply: scipy.linalg parity on top of the blocked QR.

Property checks (reconstruction, orthogonality, triangularity) at mixed
shapes and dtypes, plus direct comparison against scipy.linalg where the
factorization is unique up to column signs.
"""

import numpy as np
import pytest
import scipy.linalg as sla

import jax.numpy as jnp

import cuda_qr_tpu as ctq

CFG64 = ctq.QRConfig(panel_width=16, dtype=jnp.float64, use_pallas=False)
SHAPES = [(48, 48), (96, 40), (40, 96), (130, 50)]


def _tol(dtype, n):
    eps = np.finfo(np.dtype(dtype).name.replace("complex64", "float32")
                   .replace("complex128", "float64")).eps
    return 8 * n * eps


def _mk(rng, shape, dtype):
    A = rng.standard_normal(shape)
    if np.dtype(dtype).kind == "c":
        A = A + 1j * rng.standard_normal(shape)
    return A.astype(dtype)


@pytest.mark.parametrize("shape", SHAPES)
@pytest.mark.parametrize("dtype", [np.float32, np.complex64])
def test_lq(rng, shape, dtype):
    A = _mk(rng, shape, dtype)
    m, n = shape
    k = min(m, n)
    L, Q = ctq.lq(A, mode="reduced")
    L, Q = np.asarray(L), np.asarray(Q)
    assert L.shape == (m, k) and Q.shape == (k, n)
    tol = _tol(dtype, max(shape))
    assert np.linalg.norm(L @ Q - A) / np.linalg.norm(A) < tol
    assert np.linalg.norm(Q @ Q.conj().T - np.eye(k)) < tol
    assert np.linalg.norm(np.triu(L, 1)) < tol * np.linalg.norm(L)
    L2 = np.asarray(ctq.lq(A, mode="l"))
    assert np.allclose(L2, L, atol=tol * np.linalg.norm(L))


@pytest.mark.parametrize("shape", SHAPES)
@pytest.mark.parametrize("dtype", [np.float32, np.complex64])
def test_rq(rng, shape, dtype):
    A = _mk(rng, shape, dtype)
    m, n = shape
    k = min(m, n)
    R, Q = ctq.rq(A, mode="reduced")
    R, Q = np.asarray(R), np.asarray(Q)
    assert R.shape == (m, k) and Q.shape == (k, n)
    tol = _tol(dtype, max(shape))
    assert np.linalg.norm(R @ Q - A) / np.linalg.norm(A) < tol
    assert np.linalg.norm(Q @ Q.conj().T - np.eye(k)) < tol
    # upper-trapezoidal: R[i, j] = 0 for i - (m - k) > j
    low = np.tril(R, -(m - k) - 1)
    assert np.linalg.norm(low) < tol * np.linalg.norm(R)
    R2 = np.asarray(ctq.rq(A, mode="r"))
    assert np.allclose(R2, R, atol=tol * np.linalg.norm(R))


@pytest.mark.parametrize("shape", SHAPES)
@pytest.mark.parametrize("dtype", [np.float32, np.complex64])
def test_ql(rng, shape, dtype):
    A = _mk(rng, shape, dtype)
    m, n = shape
    k = min(m, n)
    Q, L = ctq.ql(A, mode="reduced")
    Q, L = np.asarray(Q), np.asarray(L)
    assert Q.shape == (m, k) and L.shape == (k, n)
    tol = _tol(dtype, max(shape))
    assert np.linalg.norm(Q @ L - A) / np.linalg.norm(A) < tol
    assert np.linalg.norm(Q.conj().T @ Q - np.eye(k)) < tol
    # lower-trapezoidal: L[i, j] = 0 for j - (n - k) > i
    up = np.triu(L, (n - k) + 1)
    assert np.linalg.norm(up) < tol * np.linalg.norm(L)


def test_lq_matches_scipy_up_to_signs(rng):
    A = rng.standard_normal((64, 40)).astype(np.float64)
    L, Q = ctq.lq(A, config=CFG64)
    # scipy.linalg has no lq(); its qr of A^T is the reference factorization
    Qs_t, Rs_t = sla.qr(A.T, mode="economic")
    Ls, Qs = Rs_t.T, Qs_t.T
    # unique up to the sign of each row of Q / column of L
    s = np.sign(np.diagonal(np.asarray(L)))
    ss = np.sign(np.diagonal(Ls))
    assert np.allclose(np.asarray(L) * (s * ss), Ls, atol=1e-10)
    assert np.allclose(np.asarray(Q) * (s * ss)[:, None], Qs, atol=1e-10)


def test_rq_matches_scipy_up_to_signs(rng):
    A = rng.standard_normal((40, 64)).astype(np.float64)
    R, Q = ctq.rq(A, config=CFG64, mode="reduced")
    Rs, Qs = sla.rq(A, mode="economic")
    s = np.sign(np.diagonal(np.asarray(R)))
    ss = np.sign(np.diagonal(Rs))
    assert np.allclose(np.asarray(R) * (s * ss), Rs, atol=1e-10)
    assert np.allclose(np.asarray(Q) * (s * ss)[:, None], Qs, atol=1e-10)


def test_complete_modes(rng):
    A = rng.standard_normal((48, 20)).astype(np.float32)
    L, Q = ctq.lq(A.T.copy(), mode="complete")   # wide input 20 x 48
    assert np.asarray(Q).shape == (48, 48) and np.asarray(L).shape == (20, 48)
    assert np.linalg.norm(np.asarray(L) @ np.asarray(Q) - A.T) < 1e-4
    Qc, Lc = ctq.ql(A, mode="complete")
    assert np.asarray(Qc).shape == (48, 48) and np.asarray(Lc).shape == (48, 20)
    assert np.linalg.norm(np.asarray(Qc) @ np.asarray(Lc) - A) < 1e-4


@pytest.mark.parametrize("shape", [(96, 40), (40, 96)])
def test_qr_multiply_left_right(rng, shape):
    m, n = shape
    k = min(m, n)
    A = rng.standard_normal(shape).astype(np.float32)
    Q, R = ctq.qr(A)
    Q, R = np.asarray(Q), np.asarray(R)

    C = rng.standard_normal((k, 7)).astype(np.float32)
    out, R2 = ctq.qr_multiply(A, C, mode="left")
    assert np.allclose(np.asarray(R2), R, atol=1e-4)
    assert np.allclose(np.asarray(out), Q @ C, atol=1e-4)

    Cm = rng.standard_normal((m, 7)).astype(np.float32)
    out_t, _ = ctq.qr_multiply(A, Cm, mode="left", transpose=True)
    assert np.allclose(np.asarray(out_t), Q.T @ Cm, atol=1e-4)

    Cr = rng.standard_normal((5, m)).astype(np.float32)
    out_r, _ = ctq.qr_multiply(A, Cr, mode="right")
    assert np.allclose(np.asarray(out_r), Cr @ Q, atol=1e-4)

    Crk = rng.standard_normal((5, k)).astype(np.float32)
    out_rt, _ = ctq.qr_multiply(A, Crk, mode="right", transpose=True)
    assert np.allclose(np.asarray(out_rt), Crk @ Q.T, atol=1e-4)


def test_qr_multiply_vector_and_complex(rng):
    A = (rng.standard_normal((60, 24))
         + 1j * rng.standard_normal((60, 24))).astype(np.complex64)
    Q, R = ctq.qr(A)
    c = (rng.standard_normal(24) + 1j * rng.standard_normal(24)).astype(np.complex64)
    out, _ = ctq.qr_multiply(A, c, mode="left")
    assert out.shape == (60,)
    assert np.allclose(np.asarray(out), np.asarray(Q) @ c, atol=1e-4)
    cm = (rng.standard_normal(60) + 1j * rng.standard_normal(60)).astype(np.complex64)
    out_t, _ = ctq.qr_multiply(A, cm, mode="left", transpose=True)
    assert np.allclose(np.asarray(out_t), np.asarray(Q).conj().T @ cm, atol=1e-4)


def test_qr_multiply_bad_args(rng):
    A = rng.standard_normal((30, 10)).astype(np.float32)
    with pytest.raises(ctq.QRShapeError):
        ctq.qr_multiply(A, rng.standard_normal((30, 2)).astype(np.float32),
                        mode="left")  # needs k=10 rows
    with pytest.raises(ctq.QRShapeError):
        ctq.qr_multiply(A, rng.standard_normal((10, 2)).astype(np.float32),
                        mode="sideways")


def test_lq_differentiable(rng):
    """lq/rq/ql inherit the thin-QR custom VJP through transposes/flips."""
    import jax
    A = jnp.asarray(rng.standard_normal((10, 24)))  # wide -> lq reduced

    def loss(A):
        L, Q = ctq.lq(A, config=CFG64)
        return jnp.sum(L ** 2) + jnp.sum(Q[:, 0] ** 3)

    g = jax.grad(loss)(A)
    eps = 1e-6
    fd = (loss(A.at[2, 5].add(eps)) - loss(A.at[2, 5].add(-eps))) / (2 * eps)
    assert abs(float(g[2, 5]) - float(fd)) < 1e-5 * max(1.0, abs(float(fd)))
