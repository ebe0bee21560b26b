"""Distributed CAQR: communication-avoiding QR of a row-sharded matrix.

The full-matrix factorization the reference points at but never builds (its
README cites the CAQR paper, README.md:3; the code itself is single-GPU,
qr.cu:518).  Each column panel is factored TSQR-style across the mesh:

  1. every shard reduces its live rows of the panel with local Householder
     reflectors (masked geqr2 with a per-shard dynamic row offset);
  2. the per-shard nb x nb R blocks are all-gathered, rotated so the
     diagonal-owning shard sits in stack slot 0, and the P*nb x nb stack is
     factored redundantly on every shard (allreduce-TSQR combine -- one
     collective round, no tree latency);
  3. the trailing matrix gets the local update shard-locally (larfb = three
     MXU GEMMs) and the stacked update on the gathered nb-row strips, which
     are scattered back by inverse rotation.

The Q operator is kept in two-level form: per-shard packed V/T (leaf level)
plus per-panel stacked packed V/T (tree level) -- the same compact-WY
machinery as the single-chip path, nested.  Communication per panel is
O(P * nb * (nb + w)) gather words on ICI; no row of A ever moves between
shards.

Why dead shards need no special casing: a shard whose rows all lie above
the panel diagonal sees row_offset == mloc, every reflector norm is 0, the
zero-column guard yields tau = 0 (H = I), and its gathered R block is
masked to zero, so the stacked QR never mixes it (reflector support never
reaches zero rows).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.householder import geqr2, geqr2_dyn, larfb, larft, unpack_v
from ..utils.config import DEFAULT_CONFIG, QRConfig
from .mesh import ROW_AXIS


class CAQRFactors(NamedTuple):
    """Two-level packed CAQR factors (all leaves are arrays).

    local_packed: (m, n)        row-sharded leaf V/R (packed, per shard)
    local_taus:   (P, k, nb)    leaf taus, leading axis sharded
    local_Ts:     (P, k, nb, nb)
    tree_packed:  (k, P*nb, nb) replicated stacked-QR factors per panel
    tree_Ts:      (k, nb, nb)
    """
    local_packed: jnp.ndarray
    local_taus: jnp.ndarray
    local_Ts: jnp.ndarray
    tree_packed: jnp.ndarray
    tree_Ts: jnp.ndarray


class CAQRFactorsBK(NamedTuple):
    """Two-level CAQR factors with the tree Q in compact kernel form.

    The per-panel tree transform is G = I - Y N Y^T (orthogonal) with the
    Y_i column blocks held shard-locally -- applying G(^T) costs one
    psum(nb x w) instead of gathering P*nb x w strips.  The (Y, N) pair is
    built by Householder reconstruction on the stacked orthonormal map M
    (_bk_combine): Y = (E_owner - M S) Wi is unit-lower at the owner block
    and N is the compact-WY T factor.

    local_packed: (m, n)         row-sharded leaf V/R
    local_taus:   (P, k, nb)
    local_Ts:     (P, k, nb, nb)
    Ys:           (P, k, nb, nb) Y_i = ((E_owner - M S) Wi)_i per shard
                                 (M = orthonormal map stacked_R = M R_final),
                                 leading axis sharded
    signs:        (k, nb)        per-panel sign vector S (replicated)
    Ns:           (k, nb, nb)    per-panel compact-WY T with G = I - Y N Y^T
    """
    local_packed: jnp.ndarray
    local_taus: jnp.ndarray
    local_Ts: jnp.ndarray
    Ys: jnp.ndarray
    signs: jnp.ndarray
    Ns: jnp.ndarray


def _unpack_v_dyn(packed, off):
    m, n = packed.shape
    r = jax.lax.broadcasted_iota(jnp.int32, (m, n), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (m, n), 1) + jnp.asarray(off, jnp.int32)
    return jnp.where(r > c, packed, jnp.where(r == c, 1, 0).astype(packed.dtype))


def _roll_to_owner(gathered, owner, P_):
    """(P, nb, x) gathered blocks -> (P*nb, x) stack with owner in slot 0."""
    rolled = jnp.concatenate([gathered[owner:], gathered[:owner]], axis=0)
    return rolled.reshape(P_ * gathered.shape[1], gathered.shape[2])


def _layout_fns(layout: str, nb: int, mloc: int, P_: int):
    """(owner_of_panel, offset_of_shard) for a row distribution.

    "block":  shard i owns contiguous global rows [i*mloc, (i+1)*mloc);
              live local rows for panel k start at clip(k*nb - i*mloc).
    "cyclic": nb-row blocks dealt round-robin (global block g on shard
              g % P_ at local block g // P_) -- the ScaLAPACK-style layout
              BASELINE.json config 5 names.  Live blocks for panel k are
              g >= k, i.e. local blocks b >= ceil((k - i)/P_): still a
              contiguous local suffix, so the same dynamic-offset machinery
              serves both layouts; cyclic keeps every shard busy until the
              last P_ panels instead of idling shards above the diagonal.
    """
    if layout == "block":
        def owner(kk):
            return (kk * nb) // mloc

        def offset(i, kk):
            return jnp.clip(kk * nb - i * mloc, 0, mloc)
    elif layout == "cyclic":
        def owner(kk):
            return kk % P_

        def offset(i, kk):
            bmin = jnp.maximum(kk - i + P_ - 1, 0) // P_
            return jnp.clip(bmin * nb, 0, mloc)
    else:
        raise ValueError(f"unknown layout {layout!r}")
    return owner, offset


def cyclic_permutation(m: int, nb: int, P_: int):
    """Global-row permutation mapping logical rows to the cyclic layout's
    storage order (and its inverse): storage position of global block g is
    (g % P_) * (blocks/P_) + g // P_."""
    import numpy as np
    nblk = m // nb
    order = np.argsort(np.arange(nblk) % P_, kind="stable")
    perm = (order[:, None] * nb + np.arange(nb)[None, :]).reshape(-1)
    inv = np.empty_like(perm)
    inv[perm] = np.arange(m)
    return perm, inv


def _bk_combine(Rl, i, owner, P_, prec, dtype):
    """Compact-kernel tree combine of the per-shard leaf R blocks.

    Returns (Y_i, N, s, Rfin): the shard-local kernel column block, the
    replicated nb x nb compact-WY factor N, the sign vector s, and the
    combined panel R.  M (stacked over shards) is the orthonormal map
    stacked_R = M Rfin, computed by CholeskyQR2 on the psum'd Gram of the
    R blocks (two nb x nb collectives); the tree transform is then the
    orthogonal G = I - Y N Y^T with G E_owner S = M, built by Householder
    reconstruction on M (see the kernel-construction comment below), so
    applying it to trailing strips needs ONE psum(nb x w) -- no P*nb x w
    gather and no P-fold redundant stacked QR.  Cholesky breakdown
    (cond^2(panel) * eps >~ 1) falls back to an explicit stacked Householder
    QR for M under lax.cond (the predicate is shard-uniform: it derives
    from the psum'd Gram).
    """
    from ..ops.smalllinalg import cholesky_with_inv, lu_with_inv

    nb = Rl.shape[0]
    eye = jnp.eye(nb, dtype=dtype)

    G_R = jax.lax.psum(
        jnp.einsum("ij,ik->jk", Rl, Rl, precision=prec), ROW_AXIS)
    L1, L1i = cholesky_with_inv(G_R, prec)
    M0 = jnp.einsum("ij,kj->ik", Rl, L1i, precision=prec)     # Rl L1^-T
    # Round 2 on the TRUE Gram of M0 (one more nb x nb psum): this captures
    # the Gram-formation error of round 1, which L1i G_R L1i^T would miss --
    # without it the tree Q's orthogonality defect is ~eps * cond(panel)^2.
    G2 = jax.lax.psum(
        jnp.einsum("ij,ik->jk", M0, M0, precision=prec), ROW_AXIS)
    E = G2 - eye
    emax = jnp.max(jnp.abs(E))
    tol = 3e-4 if dtype == jnp.float32 else 3e-8

    def taylor(E):
        C = jnp.tril(E, -1) + 0.5 * jnp.diag(jnp.diagonal(E))
        return eye + C, eye - C

    L2, L2i = jax.lax.cond(
        emax < tol, taylor,
        lambda E: cholesky_with_inv(E + eye, prec), E)
    # Breakdown OR round-1 orthogonality error too large for round 2 to
    # square away (CholeskyQR2 needs ||M0^T M0 - I|| < ~1/2): fall back.
    bad = (~jnp.isfinite(jnp.sum(L2i) + jnp.sum(M0))) | (emax > 0.3)

    def chol_branch(Rl):
        return (jnp.einsum("ij,kj->ik", M0, L2i, precision=prec),
                jnp.einsum("ji,kj->ik", L2, L1, precision=prec))

    def hh_branch(Rl):
        # Unconditionally stable: explicit Q of the gathered R stack.
        # (Collective inside cond is safe: `bad` is identical on all shards.)
        stacked = jax.lax.all_gather(Rl, ROW_AXIS).reshape(P_ * nb, nb)
        tp, ttau = geqr2(stacked, precision=prec)
        V2 = unpack_v(tp)
        T2 = larft(V2, ttau, precision=prec)
        M_stack = larfb(jnp.eye(P_ * nb, nb, dtype=dtype), V2, T2,
                        transpose=False, precision=prec)
        M_i = jax.lax.dynamic_slice_in_dim(
            M_stack, i.astype(jnp.int32) * nb, nb, 0)
        return M_i, jnp.triu(tp[:nb])

    M_i, Rfin = jax.lax.cond(bad, hh_branch, chol_branch, Rl)

    # Tree kernel from the owner's M block (gathered: all shards need it).
    # Householder-reconstruction form (Ballard et al., IPDPS 2014), NOT the
    # raw Yamamoto kernel N = (I - S M_J)^{-1}: when the owner block
    # dominates the stack (late panels, mass concentrated on one shard),
    # M_J approaches a full orthogonal matrix and spec(S M_J) approaches
    # the unit circle's +1, making that inverse arbitrarily ill-conditioned
    # REGARDLESS of the panel's own conditioning -- the same failure mode
    # fixed by the certificate gate in ops/fast_panel.py.  The HR form's LU
    # is of Y_J = I - M_J S with |diag| >= 1 (proven growth bound) and
    # costs the same single lu_with_inv.  Contract unchanged:
    # G = I - Y T Y^T is orthogonal with G E_owner S = M.
    Mg = jax.lax.all_gather(M_i, ROW_AXIS)                 # (P, nb, nb)
    MJ = Mg[owner]
    s = jnp.where(jnp.diagonal(MJ) >= 0, -1, 1).astype(dtype)
    YJ = eye - MJ * s[None, :]
    VJl, W, VJi, Wi = lu_with_inv(YJ, prec)
    T2 = jnp.einsum("ij,kj->ik", W, VJi, precision=prec)   # W VJ^-T
    is_owner = (i == owner)
    # Y_i = ((E_J - M S) Wi)_i  (unit-lower at the owner block)
    EmMS = (jnp.where(is_owner, 1.0, 0.0).astype(dtype) * eye
            - M_i * s[None, :])
    Y_i = jnp.einsum("ij,jk->ik", EmMS, Wi, precision=prec)
    return Y_i, T2, s, Rfin


@partial(jax.jit, static_argnames=("mesh", "config", "layout", "combine"))
def caqr_factor(A: jnp.ndarray, mesh: Mesh,
                config: QRConfig = DEFAULT_CONFIG, layout: str = "block",
                combine: str = "bk"):
    """Factor row-sharded A (m x n, m >= n).  Returns (factors, R).

    m must divide the mesh with per-shard rows a multiple of nb and
    n % nb == 0 (use cuda_qr_tpu.models.caqr.caqr for the padding wrapper).
    For layout="cyclic", A must already be stored in cyclic row order
    (cyclic_permutation); the models.caqr wrapper handles that.

    combine="bk" (default) reduces each panel's R blocks with two nb x nb
    psums + CholeskyQR2 and applies the tree Q in basis-kernel form (one
    psum(nb x w) per panel, O(nb^2 w) local flops) -> CAQRFactorsBK.
    combine="allgather" gathers all P R blocks and strips and factors the
    P*nb stack redundantly on every shard (one round, O(P nb w) words,
    O(P nb^2 w) flops) -> CAQRFactors.
    """
    m, n = A.shape
    nb = config.panel_width
    P_ = mesh.shape[ROW_AXIS]
    mloc = m // P_
    if m % P_ or mloc % nb or n % nb or n > m:
        from ..utils.errors import QRShapeError
        raise QRShapeError(f"caqr_factor needs m%P==0, (m/P)%nb==0, n%nb==0, "
                           f"n<=m; got m={m} n={n} P={P_} nb={nb}")
    if combine not in ("bk", "allgather"):
        raise ValueError(f"unknown combine {combine!r}")
    if jnp.iscomplexobj(A):
        if combine == "bk":
            from ..utils.errors import QRShapeError
            raise QRShapeError(
                "complex CAQR needs combine='allgather' (the basis-kernel "
                "combine's CholeskyQR2 takes real Grams); models.caqr.caqr "
                "routes this automatically")
        if not jnp.issubdtype(config.dtype, jnp.complexfloating):
            from ..utils.errors import QRShapeError
            raise QRShapeError(
                f"complex CAQR needs a complex config dtype, got "
                f"{config.dtype}")
    k = n // nb
    prec = config.precision
    A = A.astype(config.dtype)
    dtype = A.dtype
    owner_of, offset_of = _layout_fns(layout, nb, mloc, P_)

    def shard_fn(a):
        i = jax.lax.axis_index(ROW_AXIS)
        taus, Ts, tree = [], [], []
        # Depth-1 lookahead (bk combine): the next panel's columns are
        # updated FIRST each iteration and carried as their own value, so
        # iteration kk+1's leaf chain and combine collectives depend only on
        # this narrow block -- never on the wide trailing GEMM.  On real
        # hardware the ICI psums of panel kk+1 can then overlap panel kk's
        # MXU-bound wide update (async collectives); the per-column math is
        # unchanged (larfb and the strip psum act columnwise).  NOTE: the
        # overlap itself is UNVERIFIED on ICI (no multi-chip hardware any
        # round; the virtual mesh validates correctness only).
        panel = a[:, :nb]
        for kk in range(k):
            pcol = kk * nb
            owner = owner_of(kk)
            # my live-row offset into this shard (mloc == fully dead)
            off = offset_of(i, kk)
            dead = off >= mloc

            # 1. leaf factorization of my panel rows
            if combine != "bk":
                panel = a[:, pcol:pcol + nb]
            lp, ltau = geqr2_dyn(panel, off, precision=prec)
            V = _unpack_v_dyn(lp, off)
            T = larft(V, ltau, precision=prec)
            a = a.at[:, pcol:pcol + nb].set(lp)
            w = n - pcol - nb

            # 3. combine the per-shard R blocks across the mesh
            sl = jnp.minimum(off, mloc - nb).astype(jnp.int32)
            Rl = jnp.triu(jax.lax.dynamic_slice(lp, (sl, jnp.int32(0)), (nb, nb)))
            Rl = jnp.where(dead, 0, Rl)

            if combine == "bk":
                Y_i, N, s, Rfin = _bk_combine(Rl, i, owner, P_, prec, dtype)

                def apply_leaf_tree(block):
                    """Leaf larfb + tree strip psum on one column block:
                    X' = G^T (I - V T^T V^T) X, rows sl..sl+nb via psum."""
                    block = larfb(block, V, T, transpose=True, precision=prec)
                    strip = jax.lax.dynamic_slice(
                        block, (sl, jnp.int32(0)), (nb, block.shape[1]))
                    strip = jnp.where(dead, 0, strip)
                    C = jax.lax.psum(
                        jnp.einsum("ij,ik->jk", Y_i, strip, precision=prec),
                        ROW_AXIS)
                    Z = jnp.einsum("ji,jk->ik", N, C, precision=prec)
                    newstrip = strip - jnp.einsum(
                        "ij,jk->ik", Y_i, Z, precision=prec)
                    upd = jax.lax.dynamic_update_slice(
                        block, newstrip, (sl, jnp.int32(0)))
                    return jnp.where(dead, block, upd)

                if w:
                    # narrow block first: panel kk+1, carried separately
                    panel = apply_leaf_tree(a[:, pcol + nb:pcol + 2 * nb])
                    if w > nb:
                        a = a.at[:, pcol + 2 * nb:].set(
                            apply_leaf_tree(a[:, pcol + 2 * nb:]))
                tree.append((Y_i, N, s, Rfin))
            else:
                # 2. local trailing update (three MXU GEMMs)
                if w:
                    a = a.at[:, pcol + nb:].set(
                        larfb(a[:, pcol + nb:], V, T, transpose=True,
                              precision=prec))
                # gather all R blocks, owner first, stacked QR (redundant)
                gathered = jax.lax.all_gather(Rl, ROW_AXIS)    # (P, nb, nb)
                stacked = _roll_to_owner(gathered, owner, P_)  # (P*nb, nb)
                tp, ttau = geqr2(stacked, precision=prec)
                V2 = unpack_v(tp)
                T2 = larft(V2, ttau, precision=prec)

                # 4. stacked update of the trailing nb-row strips
                if w:
                    strip = jax.lax.dynamic_slice(
                        a, (sl, jnp.int32(pcol + nb)), (nb, w))
                    strip = jnp.where(dead, 0, strip)
                    gstrip = jax.lax.all_gather(strip, ROW_AXIS)  # (P, nb, w)
                    stackW = _roll_to_owner(gstrip, owner, P_)    # (P*nb, w)
                    stackW = larfb(stackW, V2, T2, transpose=True,
                                   precision=prec)
                    slot = jnp.mod(i - owner, P_)
                    mine = jax.lax.dynamic_slice_in_dim(stackW, slot * nb, nb, 0)
                    upd = jax.lax.dynamic_update_slice(
                        a, mine, (sl, jnp.int32(pcol + nb)))
                    a = jnp.where(dead, a, upd)
                tree.append((tp, T2))

            taus.append(ltau)
            Ts.append(T)

        if combine == "bk":
            Ys = jnp.stack([t[0] for t in tree])
            Ns = jnp.stack([t[1] for t in tree])
            ss = jnp.stack([t[2] for t in tree])
            Rfins = jnp.stack([t[3] for t in tree])
            return (a, jnp.stack(taus)[None], jnp.stack(Ts)[None],
                    Ys[None], Ns, ss, Rfins)
        return (a, jnp.stack(taus)[None], jnp.stack(Ts)[None],
                jnp.stack([t[0] for t in tree]),
                jnp.stack([t[1] for t in tree]))

    if combine == "bk":
        a, ltaus, lTs, Ys, Ns, ss, Rfins = shard_map(
            shard_fn, mesh=mesh,
            in_specs=P(ROW_AXIS, None),
            out_specs=(P(ROW_AXIS, None), P(ROW_AXIS), P(ROW_AXIS),
                       P(ROW_AXIS), P(), P(), P()),
            check_vma=False,
        )(A)
    else:
        a, ltaus, lTs, tpacked, tTs = shard_map(
            shard_fn, mesh=mesh,
            in_specs=P(ROW_AXIS, None),
            out_specs=(P(ROW_AXIS, None), P(ROW_AXIS), P(ROW_AXIS), P(), P()),
            check_vma=False,
        )(A)

    # Final R: finished rows live in the logical top n rows except each
    # panel's diagonal block, which is the combined panel triangle.
    if layout == "cyclic":
        # logical row l lives at storage row inv[l]
        _, inv = cyclic_permutation(m, nb, P_)
        R = jnp.triu(a[jnp.asarray(inv[:n])])
    else:
        R = jnp.triu(a[:n])
    for kk in range(k):
        pcol = kk * nb
        if combine == "bk":
            # rows of the final R block carry the Yamamoto sign flip, exactly
            # like the owner's physical strip rows do
            blk = jnp.triu(ss[kk][:, None] * Rfins[kk])
        else:
            blk = jnp.triu(tpacked[kk, :nb])
        R = R.at[pcol:pcol + nb, pcol:pcol + nb].set(blk)
    if combine == "bk":
        factors = CAQRFactorsBK(local_packed=a, local_taus=ltaus,
                                local_Ts=lTs, Ys=Ys, signs=ss, Ns=Ns)
    else:
        factors = CAQRFactors(local_packed=a, local_taus=ltaus, local_Ts=lTs,
                              tree_packed=tpacked, tree_Ts=tTs)
    return factors, R


@partial(jax.jit, static_argnames=("mesh", "config", "n_cols", "layout"))
def caqr_orgqr(factors, mesh: Mesh, n_cols: int,
               config: QRConfig = DEFAULT_CONFIG,
               layout: str = "block") -> jnp.ndarray:
    """Explicit thin Q (m x n_cols) from two-level CAQR factors,
    row-sharded (in the given layout's storage order).  Applies the
    per-panel operators in reverse: Q <- H_leaf,k (H_tree,k Q).
    Dispatches on the factors type (CAQRFactors / CAQRFactorsBK)."""
    m, n = factors.local_packed.shape
    nb = config.panel_width
    P_ = mesh.shape[ROW_AXIS]
    mloc = m // P_
    k = n // nb
    prec = config.precision
    bk = isinstance(factors, CAQRFactorsBK)

    owner_of, offset_of = _layout_fns(layout, nb, mloc, P_)

    def shard_fn(ap, ltaus, lTs, *tree):
        i = jax.lax.axis_index(ROW_AXIS)
        # my rows of I(m, n_cols), in LOGICAL row indices (for "cyclic" the
        # storage row r of shard i is logical ((r//nb)*P + i)*nb + r%nb)
        r = jax.lax.broadcasted_iota(jnp.int32, (mloc, n_cols), 0)
        if layout == "cyclic":
            logical = ((r // nb) * P_ + i) * nb + r % nb
        else:
            logical = r + i * mloc
        c = jax.lax.broadcasted_iota(jnp.int32, (mloc, n_cols), 1)
        q = (logical == c).astype(ap.dtype)
        for kk in reversed(range(k)):
            pcol = kk * nb
            owner = owner_of(kk)
            off = offset_of(i, kk)
            dead = off >= mloc
            sl = jnp.minimum(off, mloc - nb).astype(jnp.int32)

            strip = jax.lax.dynamic_slice(q, (sl, jnp.int32(0)), (nb, n_cols))
            strip = jnp.where(dead, 0, strip)
            if bk:
                # tree level: q' = G q = q - Y N psum(Y_i^T q_i)
                Ys, Ns = tree
                Y_i = Ys[0, kk]
                C = jax.lax.psum(
                    jnp.einsum("ij,ik->jk", Y_i, strip, precision=prec),
                    ROW_AXIS)
                Z = jnp.einsum("ij,jk->ik", Ns[kk], C, precision=prec)
                mine = strip - jnp.einsum("ij,jk->ik", Y_i, Z, precision=prec)
            else:
                # tree level (non-transposed), gathered stacked reflector
                tpacked, tTs = tree
                V2 = unpack_v(tpacked[kk])
                gstrip = jax.lax.all_gather(strip, ROW_AXIS)
                stackQ = _roll_to_owner(gstrip, owner, P_)
                stackQ = larfb(stackQ, V2, tTs[kk], transpose=False,
                               precision=prec)
                slot = jnp.mod(i - owner, P_)
                mine = jax.lax.dynamic_slice_in_dim(stackQ, slot * nb, nb, 0)
            upd = jax.lax.dynamic_update_slice(q, mine, (sl, jnp.int32(0)))
            q = jnp.where(dead, q, upd)

            # leaf level (non-transposed)
            V = _unpack_v_dyn(ap[:, pcol:pcol + nb], off)
            q = larfb(q, V, lTs[0, kk], transpose=False, precision=prec)
        return q

    if bk:
        return shard_map(
            shard_fn, mesh=mesh,
            in_specs=(P(ROW_AXIS, None), P(ROW_AXIS), P(ROW_AXIS),
                      P(ROW_AXIS), P()),
            out_specs=P(ROW_AXIS, None),
            check_vma=False,
        )(factors.local_packed, factors.local_taus, factors.local_Ts,
          factors.Ys, factors.Ns)
    return shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(ROW_AXIS, None), P(ROW_AXIS), P(ROW_AXIS), P(), P()),
        out_specs=P(ROW_AXIS, None),
        check_vma=False,
    )(factors.local_packed, factors.local_taus, factors.local_Ts,
      factors.tree_packed, factors.tree_Ts)


@partial(jax.jit, static_argnames=("mesh", "config", "layout", "transpose"))
def caqr_ormqr(factors, B: jnp.ndarray, mesh: Mesh,
               config: QRConfig = DEFAULT_CONFIG, layout: str = "block",
               transpose: bool = True) -> jnp.ndarray:
    """Apply the distributed Q operator to row-sharded B (m x w) without
    forming Q: Q^H B (transpose=True) or Q B.  B must be in the factors'
    storage order (for layout="cyclic", pre-permute with
    cyclic_permutation) and padded to the same m as the factorization.

    transpose=True replays the factorization's per-panel transforms in
    forward order (leaf reflectors, then the tree combine -- the same ops
    the factor loop applies to the trailing matrix); transpose=False is
    the reverse sweep caqr_orgqr uses.  Communication per panel: one
    psum(nb x w) in basis-kernel form, or a (P*nb x w) all_gather for
    allgather-form factors.
    """
    m, n = factors.local_packed.shape
    nb = config.panel_width
    P_ = mesh.shape[ROW_AXIS]
    mloc = m // P_
    k = n // nb
    prec = config.precision
    bk = isinstance(factors, CAQRFactorsBK)
    owner_of, offset_of = _layout_fns(layout, nb, mloc, P_)

    def shard_fn(ap, ltaus, lTs, b, *tree):
        i = jax.lax.axis_index(ROW_AXIS)
        w = b.shape[1]
        order = range(k) if transpose else reversed(range(k))
        for kk in order:
            pcol = kk * nb
            owner = owner_of(kk)
            off = offset_of(i, kk)
            dead = off >= mloc
            sl = jnp.minimum(off, mloc - nb).astype(jnp.int32)

            if transpose:  # leaf first (factorization order)
                V = _unpack_v_dyn(ap[:, pcol:pcol + nb], off)
                b = larfb(b, V, lTs[0, kk], transpose=True, precision=prec)

            strip = jax.lax.dynamic_slice(b, (sl, jnp.int32(0)), (nb, w))
            strip = jnp.where(dead, 0, strip)
            if bk:
                Ys, Ns = tree
                Y_i = Ys[0, kk]
                C = jax.lax.psum(
                    jnp.einsum("ij,ik->jk", jnp.conj(Y_i), strip,
                               precision=prec), ROW_AXIS)
                Nk = Ns[kk]
                Z = jnp.einsum("ji,jk->ik", jnp.conj(Nk), C, precision=prec) \
                    if transpose else \
                    jnp.einsum("ij,jk->ik", Nk, C, precision=prec)
                mine = strip - jnp.einsum("ij,jk->ik", Y_i, Z, precision=prec)
            else:
                tpacked, tTs = tree
                V2 = unpack_v(tpacked[kk])
                gstrip = jax.lax.all_gather(strip, ROW_AXIS)
                stackW = _roll_to_owner(gstrip, owner, P_)
                stackW = larfb(stackW, V2, tTs[kk], transpose=transpose,
                               precision=prec)
                slot = jnp.mod(i - owner, P_)
                mine = jax.lax.dynamic_slice_in_dim(stackW, slot * nb, nb, 0)
            upd = jax.lax.dynamic_update_slice(b, mine, (sl, jnp.int32(0)))
            b = jnp.where(dead, b, upd)

            if not transpose:  # leaf after the tree (reverse sweep)
                V = _unpack_v_dyn(ap[:, pcol:pcol + nb], off)
                b = larfb(b, V, lTs[0, kk], transpose=False, precision=prec)
        return b

    tree_args = ((factors.Ys, factors.Ns) if bk
                 else (factors.tree_packed, factors.tree_Ts))
    tree_specs = ((P(ROW_AXIS), P()) if bk else (P(), P()))
    return shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(ROW_AXIS, None), P(ROW_AXIS), P(ROW_AXIS),
                  P(ROW_AXIS, None)) + tree_specs,
        out_specs=P(ROW_AXIS, None),
        check_vma=False,
    )(factors.local_packed, factors.local_taus, factors.local_Ts,
      B.astype(factors.local_packed.dtype), *tree_args)
