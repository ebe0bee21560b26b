"""Householder reflector generation and compact-WY accumulation (pure jnp).

This is the semantic core of the library: the exact reflector conventions of
the reference (qr.cu:169-197, SURVEY.md Appendix A), expressed as masked,
fully-vectorized JAX ops so the same code runs on TPU (VPU row vectors),
under vmap (batched TSQR leaves), and on CPU for oracle comparison.

Conventions (matching the reference bit-for-bit in exact arithmetic):
    sign  = -1 if x0 < 0 else +1
    u     = x0 + sign * ||x||
    tau   = sign * u / ||x||
    diag  = -sign * ||x||          (stored R diagonal entry)
    tail  = x_tail / u             (stored below the diagonal; v0 == 1 implicit)
    H     = I - tau * v v^T
Two deliberate departures, both robustness fixes for holes verified in the
reference (SURVEY.md S4): the norm is computed with max-abs scaling (the
reference's raw sum of squares at qr.cu:146 overflows for large fp32
columns), and a zero column yields tau = 0 / H = I instead of the
reference's 0/0 NaN at qr.cu:173.

Compact-WY: T is the LAPACK-forward triangular factor with
Q = H_0 H_1 ... H_{k-1} = I - V T V^T.  The reference carries W with
Q = I + W Y^T (qr.cu:202-266); the two are related by W = -V T, Y = V,
so T is strictly the cheaper (k x k triangular vs m x k dense) carrier of
the same operator.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

Precision = jax.lax.Precision


def _row_iota(m: int, dtype=jnp.int32):
    return jax.lax.broadcasted_iota(dtype, (m, 1), 0)[:, 0]


def _h(x: jnp.ndarray) -> jnp.ndarray:
    """Elementwise conjugate -- identity (and free) for real dtypes.

    Every "V^T" in the real-arithmetic comments below is implemented as
    einsum over ``_h(V)`` so the same code paths compute the Hermitian
    transpose for complex inputs (LAPACK c/zgeqr2 conventions)."""
    return jnp.conj(x) if jnp.iscomplexobj(x) else x


def _einsum(spec: str, x: jnp.ndarray, y: jnp.ndarray,
            precision: Precision) -> jnp.ndarray:
    """Two-operand einsum that lowers complex contractions to real ones.

    The MXU has no complex datapath, and the TPU backend's builtin complex
    dot_general lowering is unreliable (measured: UNIMPLEMENTED whenever an
    operand is an HLO constant, e.g. the jnp.eye that seeds orgqr's Q).
    Lowering to four real contractions here -- (xr yr - xi yi) +
    i (xr yi + xi yr) -- keeps every GEMM on the native real MXU path at
    full ``precision``.  (The 3-multiply Karatsuba form would save one GEMM
    at the cost of a cancellation term; complex is a capability path, so the
    numerically tighter 4-GEMM form wins.)  Real inputs pass straight
    through with zero overhead.
    """
    if not (jnp.iscomplexobj(x) or jnp.iscomplexobj(y)):
        return jnp.einsum(spec, x, y, precision=precision)
    xr, xi = jnp.real(x), jnp.imag(x)
    yr, yi = jnp.real(y), jnp.imag(y)
    re = (jnp.einsum(spec, xr, yr, precision=precision)
          - jnp.einsum(spec, xi, yi, precision=precision))
    im = (jnp.einsum(spec, xr, yi, precision=precision)
          + jnp.einsum(spec, xi, yr, precision=precision))
    return jax.lax.complex(re, im)


def make_reflector(col: jnp.ndarray, d) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Householder reflector for rows >= d of ``col``.

    Args:
      col: (m,) the column (entries above row d are ignored).
      d: diagonal row index (may be traced).
    Returns:
      (v, tau, beta): full-length v with v[d] == 1 and zeros above d,
      scalar tau, scalar beta (the new diagonal entry -sign*||x||).

    Complex inputs follow LAPACK clarfg: beta = -sign(Re x0) * ||x|| is kept
    real, tau = (beta - x0) / beta is complex, v = tail / (x0 - beta), and
    H = I - tau v v^H satisfies H^H x = beta e_d.
    """
    m = col.shape[0]
    r = _row_iota(m)
    below = r > d
    x0 = jax.lax.dynamic_index_in_dim(col, d, keepdims=False)
    tail = jnp.where(below, col, 0)
    if jnp.iscomplexobj(col):
        return _make_reflector_complex(col, r, d, below, x0, tail)

    # Scaled norm: ||x|| = s * ||x/s||, s = max|x_i| (overflow guard).
    scale = jnp.maximum(jnp.max(jnp.abs(tail)), jnp.abs(x0))
    s = jnp.where(scale > 0, scale, 1).astype(col.dtype)
    ts = tail / s
    x0s = x0 / s
    norm = jnp.sqrt(x0s * x0s + jnp.sum(ts * ts)) * s

    sign = jnp.where(x0 < 0, -1, 1).astype(col.dtype)
    u = x0 + sign * norm
    degenerate = norm <= 0  # zero column => H = I
    safe_norm = jnp.where(degenerate, 1, norm)
    safe_u = jnp.where(degenerate, 1, u)
    tau = jnp.where(degenerate, 0, sign * u / safe_norm)
    beta = jnp.where(degenerate, x0, -sign * norm)
    v = jnp.where(below, col / safe_u, 0)
    v = jnp.where(degenerate, jnp.zeros_like(v), v) + (r == d).astype(col.dtype)
    return v, tau, beta


def _make_reflector_complex(col, r, d, below, x0, tail):
    """clarfg-convention reflector (complex tau, real beta)."""
    rdt = jnp.finfo(col.dtype).dtype  # matching real dtype
    scale = jnp.maximum(jnp.max(jnp.abs(tail)), jnp.abs(x0))
    s = jnp.where(scale > 0, scale, 1).astype(rdt)
    ts, x0s = tail / s, x0 / s
    norm = jnp.sqrt(jnp.abs(x0s) ** 2 +
                    jnp.sum(jnp.real(ts * jnp.conj(ts)))) * s
    sign = jnp.where(jnp.real(x0) < 0, -1, 1).astype(rdt)
    beta = -sign * norm                       # real, the stored diagonal
    # Degenerate: zero tail AND real x0 => H = I (matches clarfg's tau = 0).
    degenerate = (norm <= 0) | (
        (jnp.sum(jnp.abs(ts)) <= 0) & (jnp.imag(x0) == 0))
    safe_beta = jnp.where(degenerate, 1, beta).astype(col.dtype)
    tau = jnp.where(degenerate, 0, (safe_beta - x0) / safe_beta)
    denom = jnp.where(degenerate, 1, x0 - safe_beta)
    v = jnp.where(below, col / denom, 0)
    v = jnp.where(degenerate, jnp.zeros_like(v), v) + (r == d).astype(col.dtype)
    out_beta = jnp.where(degenerate, x0, beta.astype(col.dtype))
    return v, tau, out_beta


def geqr2_dyn(A: jnp.ndarray, row_offset,
              precision: Precision = Precision.HIGHEST):
    """geqr2 with a *traced* row offset (used by the distributed CAQR panel
    factorization, where the offset depends on jax.lax.axis_index).  A fully
    dead block (row_offset >= m) degenerates to tau = 0 / H = I per column
    via the zero-norm guard -- no special casing."""
    return _geqr2_impl(A, row_offset, precision)


@partial(jax.jit, static_argnames=("row_offset", "precision"))
def geqr2(A: jnp.ndarray, row_offset: int = 0,
          precision: Precision = Precision.HIGHEST):
    return _geqr2_impl(A, row_offset, precision)


def _geqr2_impl(A: jnp.ndarray, row_offset,
                precision: Precision = Precision.HIGHEST):
    """Unblocked Householder QR of A's lower-right block (rows >= row_offset).

    Column j is reduced over rows >= row_offset + j; rows above ``row_offset``
    are untouched (used by the blocked driver to factor a full-height panel
    whose live region starts mid-matrix).  Packed LAPACK storage: R on/above
    the (offset-shifted) diagonal, normalized reflector tails below, one tau
    per column.  Semantics of the reference's mmqr inner column loop
    (qr.cu:102-304) without the sliding-panel carve-up.

    Returns (packed, tau) with packed.shape == A.shape, tau.shape == (n,).
    """
    m, n = A.shape
    r = _row_iota(m)

    def body(j, carry):
        A, tau = carry
        d = row_offset + j
        col = jax.lax.dynamic_slice_in_dim(A, j, 1, axis=1)[:, 0]
        v, tj, beta = make_reflector(col, d)
        # Apply H = I - tau v v^T to all columns, masked to strictly-right
        # ones (left columns are finalized packed V/R and must not move).
        # Complex: the factorization applies H^H (LAPACK cgeqr2), i.e.
        # conj(tau) and v^H.
        w = _h(tj) * _einsum("i,ij->j", _h(v), A, precision=precision)
        cmask = (jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)[0] > j)
        A = A - jnp.outer(v, jnp.where(cmask, w, 0))
        # Write packed column j: R above d from earlier reflectors (already
        # in col), beta at d, normalized tail below.
        newcol = jnp.where(r < d, col, jnp.where(r == d, beta, v))
        A = jax.lax.dynamic_update_slice_in_dim(A, newcol[:, None], j, axis=1)
        tau = jax.lax.dynamic_update_slice_in_dim(tau, tj[None], j, axis=0)
        return A, tau

    tau0 = jnp.zeros((n,), A.dtype)
    A, tau = jax.lax.fori_loop(0, n, body, (A, tau0))
    return A, tau


def unpack_v(packed: jnp.ndarray, row_offset: int = 0) -> jnp.ndarray:
    """Recover the full V matrix (unit diagonal, zeros above) from packed
    storage -- the masked-read equivalent of the reference's shared-memory Y
    reconstruction with implicit 0/1 entries (qr.cu:356-404)."""
    m, n = packed.shape
    r = jax.lax.broadcasted_iota(jnp.int32, (m, n), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (m, n), 1)
    d = c + row_offset
    return jnp.where(r > d, packed, jnp.where(r == d, 1, 0).astype(packed.dtype))


def unpack_r(packed: jnp.ndarray, row_offset: int = 0) -> jnp.ndarray:
    m, n = packed.shape
    r = jax.lax.broadcasted_iota(jnp.int32, (m, n), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (m, n), 1)
    return jnp.where(r <= c + row_offset, packed, 0)


@partial(jax.jit, static_argnames=("precision",))
def larft(V: jnp.ndarray, tau: jnp.ndarray,
          precision: Precision = Precision.HIGHEST) -> jnp.ndarray:
    """Forward compact-WY T factor: Q = I - V T V^T, T upper triangular.

    Recurrence T[:j, j] = -tau_j T[:j, :j] (V[:, :j]^T v_j), T[j, j] = tau_j
    -- the same operator the reference accumulates column-by-column as
    W = -V T (z-column update, qr.cu:202-266), but O(k^2) storage instead of
    O(m k).  The Gram matrix V^T V is formed once so the loop is k small
    triangular matvecs rather than k tall GEMVs.
    """
    n = V.shape[1]
    G = _einsum("ij,ik->jk", _h(V), V, precision=precision)  # V^H V
    idx = jnp.arange(n)

    def body(j, T):
        tj = jax.lax.dynamic_index_in_dim(tau, j, keepdims=False)
        g = jax.lax.dynamic_slice_in_dim(G, j, 1, axis=1)[:, 0]
        g = jnp.where(idx < j, g, 0)
        tcol = -tj * _einsum("ij,j->i", T, g, precision=precision) \
            + tj * (idx == j).astype(V.dtype)
        return jax.lax.dynamic_update_slice_in_dim(T, tcol[:, None], j, axis=1)

    return jax.lax.fori_loop(0, n, body, jnp.zeros((n, n), V.dtype))


def panel_v(packed: jnp.ndarray, off, VJ: jnp.ndarray) -> jnp.ndarray:
    """Full V (m x nb) of one panel from packed storage + its diagonal block.

    Rows < off are zero; rows [off, off+nb) come from ``VJ`` (the panel's
    nb x nb diagonal V block -- unit-lower for Householder-style panels,
    dense for basis-kernel panels); rows >= off+nb are read from packed
    storage unmasked (they sit strictly below every column's diagonal).
    ``off`` may be traced.  Requires off + nb <= m (the blocked driver's
    padding invariant).
    """
    m, nb = packed.shape
    r = jax.lax.broadcasted_iota(jnp.int32, (m, nb), 0)
    off = jnp.asarray(off, jnp.int32)
    V = jnp.where(r >= off + nb, packed, 0)
    return jax.lax.dynamic_update_slice(V, VJ.astype(packed.dtype),
                                        (off, jnp.int32(0)))


def unit_vj(packed: jnp.ndarray, off, nb: int) -> jnp.ndarray:
    """Diagonal V block of a unit-lower (LAPACK-packed) panel: the strict
    lower triangle of packed rows [off, off+nb) plus the implicit unit
    diagonal (the reference's 0/1 reconstruction, qr.cu:356-404)."""
    blockJ = jax.lax.dynamic_slice(
        packed, (jnp.asarray(off, jnp.int32), jnp.int32(0)), (nb, nb))
    return jnp.tril(blockJ, -1) + jnp.eye(nb, dtype=packed.dtype)


def merge_wy(V1: jnp.ndarray, T1: jnp.ndarray, V2: jnp.ndarray,
             T2: jnp.ndarray,
             precision: Precision = Precision.HIGHEST) -> jnp.ndarray:
    """Combined T of the product (I - V1 T1 V1^T)(I - V2 T2 V2^T).

    With V = [V1 V2], the product equals I - V T V^T for
        T = [[T1, -T1 (V1^T V2) T2], [0, T2]].
    This is the aggregation that lets orgqr/ormqr apply g panels as ONE wide
    block reflector: g x fewer sweeps over B and g*nb-deep MXU GEMMs.
    """
    k1, k2 = T1.shape[0], T2.shape[0]
    G = _einsum("ij,ik->jk", _h(V1), V2, precision=precision)
    T12 = -_einsum("ij,jk->ik", T1,
                   _einsum("ij,jk->ik", G, T2, precision=precision),
                   precision=precision)
    z = jnp.zeros((k2, k1), T1.dtype)
    return jnp.block([[T1, T12], [z, T2]])


def larfb(B: jnp.ndarray, V: jnp.ndarray, T: jnp.ndarray, transpose: bool = True,
          precision: Precision = Precision.HIGHEST) -> jnp.ndarray:
    """Apply the block reflector to B: Q^T B (transpose=True) or Q B.

    Q^T B = B - V T^T (V^T B); Q B = B - V T (V^T B).  This is the
    reference's trailing update A <- (I + Y W^T) A (qr.cu:441-462) recast as
    three MXU GEMMs instead of a per-column PR x PR x PC scalar triple loop.
    """
    W = _einsum("ij,ik->jk", _h(V), B, precision=precision)      # V^H B
    Tm = _h(T).T if transpose else T                             # T^H or T
    W = _einsum("ij,jk->ik", Tm, W, precision=precision)
    return B - _einsum("ij,jk->ik", V, W, precision=precision)


def apply_q(B: jnp.ndarray, packed: jnp.ndarray, T: jnp.ndarray,
            row_offset: int = 0, transpose: bool = True,
            precision: Precision = Precision.HIGHEST) -> jnp.ndarray:
    """larfb on packed storage."""
    V = unpack_v(packed, row_offset)
    return larfb(B, V, T, transpose=transpose, precision=precision)
