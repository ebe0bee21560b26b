"""Least-squares solve vs numpy.linalg.lstsq."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cuda_qr_tpu.models.lstsq import lstsq
from cuda_qr_tpu.utils.config import QRConfig

CFG = QRConfig(panel_width=16, dtype=jnp.float64, use_pallas=False)


@pytest.mark.parametrize("m,n,k", [(64, 32, 1), (100, 40, 3), (50, 50, 2)])
def test_lstsq_matches_numpy(rng, m, n, k):
    A = rng.standard_normal((m, n))
    B = rng.standard_normal((m, k))
    res = lstsq(jnp.asarray(A), jnp.asarray(B), CFG)
    x_np, *_ = np.linalg.lstsq(A, B, rcond=None)
    np.testing.assert_allclose(np.asarray(res.x), x_np, atol=1e-9)
    r_np = np.linalg.norm(A @ x_np - B, axis=0)
    np.testing.assert_allclose(np.asarray(res.residual_norm), r_np, atol=1e-9)


def test_lstsq_vector_rhs(rng):
    A = rng.standard_normal((80, 20))
    b = rng.standard_normal(80)
    res = lstsq(jnp.asarray(A), jnp.asarray(b), CFG)
    assert res.x.shape == (20,)
    x_np, *_ = np.linalg.lstsq(A, b, rcond=None)
    np.testing.assert_allclose(np.asarray(res.x), x_np, atol=1e-9)


def test_lstsq_exact_system(rng):
    """Consistent system: residual ~ 0, x reproduces b."""
    A = rng.standard_normal((60, 30))
    x_true = rng.standard_normal(30)
    b = A @ x_true
    res = lstsq(jnp.asarray(A), jnp.asarray(b), CFG)
    np.testing.assert_allclose(np.asarray(res.x), x_true, atol=1e-10)
    assert float(res.residual_norm) < 1e-10


def test_lstsq_wide_raises(rng):
    with pytest.raises(ValueError):
        lstsq(jnp.zeros((10, 20)), jnp.zeros(10), CFG)


def test_solve_square(rng):
    from cuda_qr_tpu.models.lstsq import solve
    A = rng.standard_normal((40, 40))
    x_true = rng.standard_normal(40)
    x = solve(jnp.asarray(A), jnp.asarray(A @ x_true), CFG)
    np.testing.assert_allclose(np.asarray(x), x_true, atol=1e-9)
    with pytest.raises(ValueError):
        solve(jnp.zeros((4, 5)), jnp.zeros(4), CFG)


class TestGradients:
    """lstsq's implicit-function custom VJP vs finite differences."""

    CFG = None

    @classmethod
    def setup_class(cls):
        from cuda_qr_tpu.utils.config import QRConfig
        cls.CFG = QRConfig(panel_width=8, use_pallas=False,
                           dtype=jnp.float64)

    def _loss(self, A, b):
        res = lstsq(A, b, self.CFG)
        return jnp.sum(res.x ** 2) + 0.5 * jnp.sum(res.residual_norm ** 2)

    def test_matches_finite_differences(self):
        rng = np.random.default_rng(0)
        A = jnp.asarray(rng.standard_normal((24, 8)))
        b = jnp.asarray(rng.standard_normal((24, 2)))
        gA, gb = jax.grad(self._loss, argnums=(0, 1))(A, b)
        e = 1e-6
        for (i, j) in [(3, 2), (0, 0), (20, 7)]:
            fd = (self._loss(A.at[i, j].add(e), b)
                  - self._loss(A.at[i, j].add(-e), b)) / (2 * e)
            assert abs(fd - gA[i, j]) < 1e-5 * max(1.0, abs(float(fd)))
        for (i, j) in [(5, 0), (11, 1)]:
            fd = (self._loss(A, b.at[i, j].add(e))
                  - self._loss(A, b.at[i, j].add(-e))) / (2 * e)
            assert abs(fd - gb[i, j]) < 1e-5 * max(1.0, abs(float(fd)))

    def test_consistent_system_grad_finite(self):
        rng = np.random.default_rng(1)
        A = jnp.asarray(rng.standard_normal((20, 6)))
        bc = A @ jnp.asarray(rng.standard_normal((6, 1)))
        g = jax.grad(lambda a: jnp.sum(lstsq(a, bc, self.CFG).x ** 2)
                     + jnp.sum(lstsq(a, bc, self.CFG).residual_norm))(A)
        assert bool(jnp.all(jnp.isfinite(g)))

    def test_vector_b(self):
        rng = np.random.default_rng(2)
        A = jnp.asarray(rng.standard_normal((24, 8)))
        bv = jnp.asarray(rng.standard_normal(24))
        g = jax.grad(lambda a: jnp.sum(lstsq(a, bv, self.CFG).x ** 2))(A)
        e = 1e-6
        fd = (jnp.sum(lstsq(A.at[2, 3].add(e), bv, self.CFG).x ** 2)
              - jnp.sum(lstsq(A.at[2, 3].add(-e), bv, self.CFG).x ** 2)) \
            / (2 * e)
        assert abs(fd - g[2, 3]) < 1e-5


def test_lstsq_damped_matches_normal_equations(rng):
    m, n, lam = 80, 24, 0.7
    A = rng.standard_normal((m, n))
    b = rng.standard_normal((m, 2))
    res = lstsq(jnp.asarray(A), jnp.asarray(b), CFG, damp=lam)
    # ridge solution: (A^T A + lam^2 I) x = A^T b
    x_ref = np.linalg.solve(A.T @ A + lam**2 * np.eye(n), A.T @ b)
    assert np.allclose(np.asarray(res.x), x_ref, atol=1e-10)
    # augmented residual norm
    r_ref = np.sqrt(np.linalg.norm(A @ x_ref - b, axis=0) ** 2
                    + lam**2 * np.linalg.norm(x_ref, axis=0) ** 2)
    assert np.allclose(np.asarray(res.residual_norm), r_ref, rtol=1e-8)


def test_lstsq_damped_grad(rng):
    import jax
    m, n = 30, 8
    A = jnp.asarray(rng.standard_normal((m, n)))
    b = jnp.asarray(rng.standard_normal(m))

    def loss(A, b):
        return jnp.sum(lstsq(A, b, CFG, damp=0.5).x ** 2)

    g_A, g_b = jax.grad(loss, argnums=(0, 1))(A, b)
    # finite-difference check on one entry each
    eps = 1e-6
    for (g, arr, idx, setter) in [
        (g_A[3, 2], A, (3, 2), lambda a, v: a.at[3, 2].add(v)),
        (g_b[5], b, 5, lambda a, v: a.at[5].add(v)),
    ]:
        if arr is A:
            fp = loss(setter(A, eps), b); fm = loss(setter(A, -eps), b)
        else:
            fp = loss(A, setter(b, eps)); fm = loss(A, setter(b, -eps))
        fd = (fp - fm) / (2 * eps)
        assert abs(float(g) - float(fd)) < 1e-4 * max(1.0, abs(float(fd)))
