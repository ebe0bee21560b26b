"""Randomized blocked column-pivoted QR (QRCP) -- rank-revealing QR.

The reference has no pivoted QR at all; this is a capability extension in
the direction its README points (communication-avoiding / randomized dense
QR, /root/reference/README.md:3).  Classic LAPACK geqp3 is a per-column
sequential algorithm (norm downdate + swap + rank-1 update for every single
column) -- a TPU anti-pattern for exactly the reason the per-column
Householder panel was (docs/PERF.md).  Instead this implements the
randomized blocked QRCP of Duersch & Gu (SIAM JSC 2017, "Randomized QR with
column pivoting") shaped for the MXU:

  1. ONE Gaussian sketch B = Omega A (l x n, l = nb + oversample) taken up
     front -- the only full-height pass that pivoting adds.
  2. Per nb-wide block step: choose nb pivot columns by greedy
     Gram-Schmidt QRCP on the *sketch*, restricted to a top-k candidate
     subset (top 4*nb sketch column norms) so each of the nb sequential
     selection steps touches an (l x 4nb) tile, not the full width.
  3. Swap the chosen columns in with ONE gather (a vectorized permutation
     built from the selection order -- no LAPACK-style transposition
     chain), factor the panel with the regular panel kernels
     (CholeskyQR2 + basis-kernel by default, Householder fallback on
     rank-deficiency), and apply the block reflector to the trailing
     matrix -- identical math to the unpivoted scan driver.
  4. Downdate the sketch with the Duersch-Gu sample update
     B_2 <- B_2 - B_1 R_11^{-1} R_12, which makes the old sketch a sketch
     of the new Schur complement without touching A again.

Everything is static-shape and fori_loop-compatible: the pivot search is
top_k + nb small fused steps, the permutation is one scatter + one gather.

Returns the same PackedQR the unpivoted driver produces, so orgqr/ormqr/
extract_r work unchanged; `jpvt` maps factorization positions to original
columns (A[:, jpvt] = Q R).  A truncated run (num_panels < n/nb) stops
after kb = num_panels*nb columns and additionally returns
R12 = rows [0, kb) of the not-factored trailing columns, giving the
rank-revealing partial factorization A P ~= Q_kb [R11 R12].
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from ..utils.config import DEFAULT_CONFIG, QRConfig
from .blocked import PackedQR, _pad, _panel_factor_dyn
from .householder import panel_v

_H = jax.lax.Precision.HIGHEST


def _select_pivots(B, j0, nb, cand, prec, config=None):
    """Greedy sketch-space QRCP pivot selection for one block step.

    B: (l, n_pad) current sketch; j0: first active column (traced).
    Returns ordsel (n_pad,) int32: selection rank 0..nb-1 for chosen
    columns, -1 elsewhere.  Chosen columns always satisfy col >= j0.

    The nb-step greedy loop runs as one fused Mosaic kernel when eligible
    (ops/pallas_select.py); the jnp fori_loop below is the reference
    fallback (identical pivots including the lowest-index tie-break).
    """
    l, n_pad = B.shape
    col = jax.lax.broadcasted_iota(jnp.int32, (n_pad,), 0)
    active = col >= j0
    rdt = jnp.zeros((), B.dtype).real.dtype  # norms stay real
    norms = jnp.where(active, jnp.sum((B * B.conj()).real, axis=0),
                      jnp.asarray(-1.0, rdt))

    # Candidate subset: the cand largest sketch norms.  active count is
    # always >= nb, and actives (norm >= 0) always outrank inactives (-1),
    # so the candidate set contains at least nb active columns.
    _, cand_idx = jax.lax.top_k(norms, cand)
    Sc = jnp.take(B, cand_idx, axis=1)                      # (l, cand)
    norms_c = jnp.take(norms, cand_idx)
    iota_c = jax.lax.broadcasted_iota(jnp.int32, (cand,), 0)

    if config is not None and config.use_pallas and config.use_select_kernel:
        from .pallas_select import select_pivots_pallas, supported
        if supported(l, cand, nb, B.dtype):
            ord_c = select_pivots_pallas(Sc, norms_c, nb,
                                         config.resolved_interpret())
            return jnp.full((n_pad,), -1, jnp.int32).at[cand_idx].set(ord_c)

    def body(i, carry):
        Sc, norms_c, ord_c = carry
        p = jnp.argmax(norms_c).astype(jnp.int32)
        q = jax.lax.dynamic_slice(Sc, (jnp.int32(0), p), (l, 1))
        nq = jnp.sqrt(jnp.maximum(jnp.sum((q * q.conj()).real), 0))
        qn = q * jnp.where(nq > 0, 1 / nq, 0).astype(q.dtype)
        proj = jnp.einsum("ri,rj->ij", qn.conj(), Sc,
                          precision=prec)  # (1, cand) = qn^H Sc
        Sc = Sc - qn * proj
        nn = jnp.maximum(norms_c - (proj[0] * proj[0].conj()).real, 0)
        norms_c = jnp.where((iota_c == p) | (norms_c < 0), -1.0, nn)
        ord_c = jnp.where(iota_c == p, i, ord_c)
        return Sc, norms_c, ord_c

    ord_c0 = jnp.full((cand,), -1, jnp.int32)
    _, _, ord_c = jax.lax.fori_loop(
        0, nb, body, (Sc, norms_c.astype(rdt), ord_c0))
    ordsel = jnp.full((n_pad,), -1, jnp.int32).at[cand_idx].set(ord_c)
    return ordsel


def _block_perm(ordsel, j0, nb):
    """Bijective column permutation moving the nb selected columns to
    positions [j0, j0+nb) in selection order; non-selected active columns
    keep their relative order after them; columns < j0 are fixed.

    Returns perm with new[:, t] = old[:, perm[t]].
    """
    n_pad = ordsel.shape[0]
    col = jax.lax.broadcasted_iota(jnp.int32, (n_pad,), 0)
    active = col >= j0
    sel = ordsel >= 0
    nonsel_rank = jnp.cumsum((active & ~sel).astype(jnp.int32)) - 1
    dest = jnp.where(~active, col,
                     jnp.where(sel, j0 + ordsel, j0 + nb + nonsel_rank))
    return jnp.zeros((n_pad,), jnp.int32).at[dest].set(col)


@partial(jax.jit, static_argnames=("config", "num_panels"))
def qrcp_blocked(A: jnp.ndarray, config: QRConfig = DEFAULT_CONFIG,
                 key: jnp.ndarray | None = None,
                 num_panels: int | None = None):
    """Column-pivoted blocked QR: A[:, jpvt] = Q R (full) or, truncated,
    A[:, jpvt[:kb]] ~= Q R11 with R12 covering the remaining columns.

    Returns (factors, jpvt, R12):
      factors: PackedQR over the kb = num_panels*nb factored columns --
               orgqr/ormqr/extract_r consume it unchanged;
      jpvt:    (n_pad,) original-column index at each factorization
               position (positions >= n are the zero pad columns, which
               always sort last);
      R12:     (kb, n_pad - kb) top rows of the unfactored trailing
               columns (empty for a full factorization).
    """
    m, n = A.shape
    if m < n:
        from ..utils.errors import QRShapeError
        raise QRShapeError(f"qrcp_blocked requires m >= n, got {m}x{n}")
    if jnp.iscomplexobj(A):
        # complex QRCP: Householder panels (geqr2), jnp pivot selection
        # (the Mosaic select kernel is real-only), complex Gaussian sketch.
        config = config.replace(dtype=A.dtype, use_pallas=False,
                                use_chol_kernel=False,
                                use_select_kernel=False)
    nb = config.panel_width
    A = _pad(A.astype(config.dtype), nb)
    m_pad, n_pad = A.shape
    k = n_pad // nb
    kp = k if num_panels is None else min(num_panels, k)
    prec = config.precision
    sdt = jnp.float32 if A.dtype == jnp.bfloat16 else A.dtype
    tdt = jnp.float32 if A.dtype == jnp.bfloat16 else A.dtype

    l = min(m_pad, nb + 32)
    cand = min(n_pad, 4 * nb)
    if key is None:
        key = jax.random.key(12)  # reference's fixed srand(12), qr.cu:765
    Omega = jax.random.normal(key, (l, m_pad), dtype=sdt) / jnp.sqrt(
        jnp.asarray(l, sdt))
    B = jnp.einsum("lr,rc->lc", Omega, A.astype(sdt), precision=prec)

    cmask = jax.lax.broadcasted_iota(jnp.int32, (1, n_pad), 1)

    def body(j, carry):
        j = jnp.asarray(j, jnp.int32)
        A, B, jpvt, Ps, taus, Ts, VJs = carry
        j0 = j * nb

        ordsel = _select_pivots(B, j0, nb, cand, prec, config)
        perm = _block_perm(ordsel, j0, nb)
        A = jnp.take(A, perm, axis=1)
        B = jnp.take(B, perm, axis=1)
        jpvt = jnp.take(jpvt, perm)

        panel = jax.lax.dynamic_slice(A, (jnp.int32(0), j0), (m_pad, nb))
        packed, tau, T, VJ = _panel_factor_dyn(panel, j0, config)
        V = panel_v(packed, j0, VJ)
        Ps = jax.lax.dynamic_update_slice(
            Ps, packed[None].astype(Ps.dtype), (j, jnp.int32(0), jnp.int32(0)))
        taus = jax.lax.dynamic_update_slice(
            taus, tau[None].astype(tdt), (j, jnp.int32(0)))
        Ts = jax.lax.dynamic_update_slice(
            Ts, T[None].astype(tdt), (j, jnp.int32(0), jnp.int32(0)))
        VJs = jax.lax.dynamic_update_slice(
            VJs, VJ[None].astype(tdt), (j, jnp.int32(0), jnp.int32(0)))

        # Trailing update A <- (I - V T V^T)^T A on columns >= j0+nb.
        Tc = T.astype(tdt)
        W = jnp.einsum("ri,rj->ij", V.conj(), A, precision=prec)   # V^H A
        W = jnp.einsum("ij,ik->jk", Tc.conj(), W, precision=prec)  # T^H ...
        U = jnp.einsum("ri,ij->rj", V, W, precision=prec)
        A = A - jnp.where(cmask >= j0 + nb, U, 0).astype(A.dtype)

        # Duersch-Gu sample update: B2 <- B2 - B1 R11^{-1} R12, turning the
        # existing sketch into a sketch of the new Schur complement.  A
        # (numerically) singular R11 -- rank exhausted -- gets unit diagonal
        # stand-ins so the solve stays finite; the affected directions are
        # noise-level anyway.
        R1 = jnp.triu(jax.lax.dynamic_slice(packed, (j0, jnp.int32(0)),
                                            (nb, nb))).astype(sdt)
        d = jnp.diagonal(R1)
        dmax = jnp.max(jnp.abs(d))
        tiny = jnp.asarray(jnp.finfo(sdt).eps, sdt) * jnp.maximum(dmax, 1)
        safe = jnp.abs(d) > tiny
        R1 = R1 + jnp.diag(jnp.where(safe, 0, 1).astype(sdt) -
                           jnp.where(safe, 0, d))
        rows = jax.lax.dynamic_slice(A, (j0, jnp.int32(0)),
                                     (nb, n_pad)).astype(sdt)
        X = jax.scipy.linalg.solve_triangular(R1, rows, lower=False)
        B1 = jax.lax.dynamic_slice(B, (jnp.int32(0), j0), (l, nb))
        upd = jnp.einsum("li,ic->lc", B1, X, precision=prec)
        B = jnp.where(cmask >= j0 + nb, B - upd, B)
        return A, B, jpvt, Ps, taus, Ts, VJs

    Ps0 = jnp.zeros((kp, m_pad, nb), A.dtype)
    taus0 = jnp.zeros((kp, nb), tdt)
    Ts0 = jnp.zeros((kp, nb, nb), tdt)
    VJs0 = jnp.zeros((kp, nb, nb), tdt)
    jpvt0 = jnp.arange(n_pad, dtype=jnp.int32)
    A, B, jpvt, Ps, taus, Ts, VJs = jax.lax.fori_loop(
        0, kp, body, (A, B, jpvt0, Ps0, taus0, Ts0, VJs0))

    kb = kp * nb
    packed = jnp.swapaxes(Ps, 0, 1).reshape(m_pad, kb)
    factors = PackedQR(packed=packed, taus=taus, Ts=Ts, VJs=VJs)
    R12 = A[:kb, kb:]
    return factors, jpvt, R12
