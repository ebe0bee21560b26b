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


@partial(jax.jit, static_argnames=("mesh", "config", "layout"))
def caqr_factor(A: jnp.ndarray, mesh: Mesh,
                config: QRConfig = DEFAULT_CONFIG, layout: str = "block"):
    """Factor row-sharded A (m x n, m >= n).  Returns (CAQRFactors, R).

    m must divide the mesh with per-shard rows a multiple of nb and
    n % nb == 0 (use cuda_qr_tpu.models.caqr.caqr for the padding wrapper).
    For layout="cyclic", A must already be stored in cyclic row order
    (cyclic_permutation); the models.caqr wrapper handles that.
    """
    m, n = A.shape
    nb = config.panel_width
    P_ = mesh.shape[ROW_AXIS]
    mloc = m // P_
    if m % P_ or mloc % nb or n % nb or n > m:
        from ..utils.errors import QRShapeError
        raise QRShapeError(f"caqr_factor needs m%P==0, (m/P)%nb==0, n%nb==0, "
                           f"n<=m; got m={m} n={n} P={P_} nb={nb}")
    k = n // nb
    prec = config.precision
    A = A.astype(config.dtype)
    owner_of, offset_of = _layout_fns(layout, nb, mloc, P_)

    def shard_fn(a):
        i = jax.lax.axis_index(ROW_AXIS)
        taus, Ts, tpacked, tTs = [], [], [], []
        for kk in range(k):
            pcol = kk * nb
            owner = owner_of(kk)
            # my live-row offset into this shard (mloc == fully dead)
            off = offset_of(i, kk)
            dead = off >= mloc

            # 1. leaf factorization of my panel rows
            panel = a[:, pcol:pcol + nb]
            lp, ltau = geqr2_dyn(panel, off, precision=prec)
            V = _unpack_v_dyn(lp, off)
            T = larft(V, ltau, precision=prec)
            a = a.at[:, pcol:pcol + nb].set(lp)

            # 2. local trailing update (three MXU GEMMs)
            w = n - pcol - nb
            if w:
                a = a.at[:, pcol + nb:].set(
                    larfb(a[:, pcol + nb:], V, T, transpose=True,
                          precision=prec))

            # 3. gather per-shard R blocks, owner first, stacked QR
            sl = jnp.minimum(off, mloc - nb).astype(jnp.int32)
            Rl = jnp.triu(jax.lax.dynamic_slice(lp, (sl, jnp.int32(0)), (nb, nb)))
            Rl = jnp.where(dead, 0, Rl)
            gathered = jax.lax.all_gather(Rl, ROW_AXIS)        # (P, nb, nb)
            stacked = _roll_to_owner(gathered, owner, P_)      # (P*nb, nb)
            tp, ttau = geqr2(stacked, precision=prec)
            V2 = unpack_v(tp)
            T2 = larft(V2, ttau, precision=prec)

            # 4. stacked update of the trailing nb-row strips
            if w:
                strip = jax.lax.dynamic_slice(a, (sl, jnp.int32(pcol + nb)), (nb, w))
                strip = jnp.where(dead, 0, strip)
                gstrip = jax.lax.all_gather(strip, ROW_AXIS)   # (P, nb, w)
                stackW = _roll_to_owner(gstrip, owner, P_)     # (P*nb, w)
                stackW = larfb(stackW, V2, T2, transpose=True, precision=prec)
                slot = jnp.mod(i - owner, P_)
                mine = jax.lax.dynamic_slice_in_dim(stackW, slot * nb, nb, 0)
                upd = jax.lax.dynamic_update_slice(a, mine, (sl, jnp.int32(pcol + nb)))
                a = jnp.where(dead, a, upd)

            taus.append(ltau)
            Ts.append(T)
            tpacked.append(tp)
            tTs.append(T2)
        return (a, jnp.stack(taus)[None], jnp.stack(Ts)[None],
                jnp.stack(tpacked), jnp.stack(tTs))

    a, ltaus, lTs, tpacked, tTs = shard_map(
        shard_fn, mesh=mesh,
        in_specs=P(ROW_AXIS, None),
        out_specs=(P(ROW_AXIS, None), P(ROW_AXIS), P(ROW_AXIS), P(), P()),
        check_vma=False,
    )(A)

    # Final R: finished rows live in the logical top n rows except each
    # panel's diagonal block, which is the stacked QR's top triangle.
    if layout == "cyclic":
        # logical row l lives at storage row inv[l]
        _, inv = cyclic_permutation(m, nb, P_)
        R = jnp.triu(a[jnp.asarray(inv[:n])])
    else:
        R = jnp.triu(a[:n])
    for kk in range(k):
        pcol = kk * nb
        R = R.at[pcol:pcol + nb, pcol:pcol + nb].set(
            jnp.triu(tpacked[kk, :nb]))
    factors = CAQRFactors(local_packed=a, local_taus=ltaus, local_Ts=lTs,
                          tree_packed=tpacked, tree_Ts=tTs)
    return factors, R


@partial(jax.jit, static_argnames=("mesh", "config", "n_cols", "layout"))
def caqr_orgqr(factors: CAQRFactors, mesh: Mesh, n_cols: int,
               config: QRConfig = DEFAULT_CONFIG,
               layout: str = "block") -> jnp.ndarray:
    """Explicit thin Q (m x n_cols) from two-level CAQR factors,
    row-sharded (in the given layout's storage order).  Applies the
    per-panel operators in reverse: Q <- H_leaf,k (H_tree,k Q)."""
    m, n = factors.local_packed.shape
    nb = config.panel_width
    P_ = mesh.shape[ROW_AXIS]
    mloc = m // P_
    k = n // nb
    prec = config.precision

    owner_of, offset_of = _layout_fns(layout, nb, mloc, P_)

    def shard_fn(ap, ltaus, lTs, tpacked, tTs):
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

            # tree level (non-transposed)
            V2 = unpack_v(tpacked[kk])
            strip = jax.lax.dynamic_slice(q, (sl, jnp.int32(0)), (nb, n_cols))
            strip = jnp.where(dead, 0, strip)
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

    return shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(ROW_AXIS, None), P(ROW_AXIS), P(ROW_AXIS), P(), P()),
        out_specs=P(ROW_AXIS, None),
        check_vma=False,
    )(factors.local_packed, factors.local_taus, factors.local_Ts,
      factors.tree_packed, factors.tree_Ts)
