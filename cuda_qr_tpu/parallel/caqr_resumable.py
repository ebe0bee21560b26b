"""Resumable distributed CAQR: panel-at-a-time driver with checkpointing.

The monolithic caqr_factor jits the whole panel loop -- fastest, but a
crash loses everything.  This driver runs ONE panel per device call (a
single compiled step reused for every panel: the panel index, owner, and
column window are all traced, with full-width masked trailing updates like
the scan driver) and snapshots (A, accumulated factors, panel index) every
``every`` panels via utils.checkpoint.  Killing the process at any point
loses at most ``every`` panels of work; rerunning the same call resumes
from the snapshot.  This is the elastic-recovery story the reference lacks
entirely (HANDLE_ERROR exits, qr.cu:467-471; SURVEY.md S5).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.householder import geqr2, geqr2_dyn, larfb, larft, unpack_v
from ..utils.checkpoint import load_state, save_state
from ..utils.config import DEFAULT_CONFIG, QRConfig
from .caqr import (CAQRFactors, CAQRFactorsBK, _bk_combine, _layout_fns,
                   _unpack_v_dyn, cyclic_permutation)
from .mesh import ROW_AXIS, row_sharding


def _owner_dyn(layout: str, nb: int, mloc: int, P_: int):
    """Panel owner from a TRACED panel index (the static owner_of from
    _layout_fns serves the monolithic per-panel unroll)."""
    if layout == "cyclic":
        return lambda kk: jnp.mod(kk, P_)
    return lambda kk: (kk * nb) // mloc


@partial(jax.jit, static_argnames=("mesh", "config", "layout"))
def _panel_step(A, kk, mesh: Mesh, config: QRConfig, layout: str):
    """One CAQR panel step with a TRACED panel index kk.

    Returns (A_updated, ltau (P,nb), lT (P,nb,nb), tpacked (P*nb,nb),
    tT (nb,nb)).  Column windows are handled by masking (uniform shapes
    => one compilation serves every panel)."""
    m, n = A.shape
    nb = config.panel_width
    P_ = mesh.shape[ROW_AXIS]
    mloc = m // P_
    prec = config.precision
    _, offset_of = _layout_fns(layout, nb, mloc, P_)
    owner_dyn = _owner_dyn(layout, nb, mloc, P_)

    def shard_fn(a, kk):
        kk = kk[0]
        i = jax.lax.axis_index(ROW_AXIS)
        pcol = kk * nb
        owner = owner_dyn(kk)
        off = offset_of(i, kk).astype(jnp.int32)
        dead = off >= mloc
        sl = jnp.minimum(off, mloc - nb).astype(jnp.int32)
        col_iota = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)

        # leaf factor of the panel columns (dynamic window)
        panel = jax.lax.dynamic_slice(a, (jnp.int32(0), pcol), (mloc, nb))
        lp, ltau = geqr2_dyn(panel, off, precision=prec)
        V = _unpack_v_dyn(lp, off)
        T = larft(V, ltau, precision=prec)
        a = jax.lax.dynamic_update_slice(a, lp, (jnp.int32(0), pcol))

        # local trailing update, full width, masked to columns > panel
        W = jnp.einsum("ri,rj->ij", V, a, precision=prec)
        W = jnp.einsum("ij,ik->jk", T, W, precision=prec)
        U = jnp.einsum("ri,ij->rj", V, W, precision=prec)
        a = a - jnp.where(col_iota >= pcol + nb, U, 0)

        # gathered stacked QR of the R blocks, owner slot first
        Rl = jnp.triu(jax.lax.dynamic_slice(lp, (sl, jnp.int32(0)), (nb, nb)))
        Rl = jnp.where(dead, 0, Rl)
        gathered = jax.lax.all_gather(Rl, ROW_AXIS)          # (P, nb, nb)
        stacked = jnp.roll(gathered, -owner, axis=0).reshape(P_ * nb, nb)
        tp, ttau = geqr2(stacked, precision=prec)
        V2 = unpack_v(tp)
        T2 = larft(V2, ttau, precision=prec)

        # stacked update of trailing strips (full width, masked)
        strip = jax.lax.dynamic_slice(a, (sl, jnp.int32(0)), (nb, n))
        strip = jnp.where((col_iota >= pcol + nb) & ~dead, strip, 0)
        gstrip = jax.lax.all_gather(strip, ROW_AXIS)         # (P, nb, n)
        stackW = jnp.roll(gstrip, -owner, axis=0).reshape(P_ * nb, n)
        stackW = larfb(stackW, V2, T2, transpose=True, precision=prec)
        slot = jnp.mod(i - owner, P_)
        mine = jax.lax.dynamic_slice_in_dim(stackW, slot * nb, nb, 0)
        cur = jax.lax.dynamic_slice(a, (sl, jnp.int32(0)), (nb, n))
        mine = jnp.where(col_iota >= pcol + nb, mine, cur)
        upd = jax.lax.dynamic_update_slice(a, mine, (sl, jnp.int32(0)))
        a = jnp.where(dead, a, upd)
        return a, ltau[None], T[None], tp, T2

    kk_arr = jnp.full((mesh.shape[ROW_AXIS],), kk, dtype=jnp.int32)
    return shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(ROW_AXIS, None), P(ROW_AXIS)),
        out_specs=(P(ROW_AXIS, None), P(ROW_AXIS), P(ROW_AXIS), P(), P()),
        check_vma=False,
    )(A, kk_arr)


@partial(jax.jit, static_argnames=("mesh", "config", "layout"))
def _panel_step_bk(A, kk, mesh: Mesh, config: QRConfig, layout: str):
    """One basis-kernel-combine CAQR panel step with a TRACED panel index.

    The per-panel math is the monolithic bk path's (leaf geqr2 + _bk_combine
    + leaf larfb + one psum(nb x w) tree strip update), minus the depth-1
    lookahead carry (each panel is its own device call here, so there is no
    following wide GEMM in the same program to overlap with).  larfb and the
    strip psum act columnwise, so masking the full-width update to columns
    > panel reproduces the monolithic exact-slice update per column.

    Returns (A_updated, ltau (P,nb), lT (P,nb,nb), Y (P,nb,nb), N (nb,nb),
    s (nb,), Rfin (nb,nb))."""
    m, n = A.shape
    nb = config.panel_width
    P_ = mesh.shape[ROW_AXIS]
    mloc = m // P_
    prec = config.precision
    _, offset_of = _layout_fns(layout, nb, mloc, P_)
    owner_dyn = _owner_dyn(layout, nb, mloc, P_)

    def shard_fn(a, kk):
        kk = kk[0]
        i = jax.lax.axis_index(ROW_AXIS)
        pcol = kk * nb
        owner = owner_dyn(kk)
        off = offset_of(i, kk).astype(jnp.int32)
        dead = off >= mloc
        sl = jnp.minimum(off, mloc - nb).astype(jnp.int32)
        col_iota = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)

        # leaf factor of the panel columns (dynamic window)
        panel = jax.lax.dynamic_slice(a, (jnp.int32(0), pcol), (mloc, nb))
        lp, ltau = geqr2_dyn(panel, off, precision=prec)
        V = _unpack_v_dyn(lp, off)
        T = larft(V, ltau, precision=prec)
        a = jax.lax.dynamic_update_slice(a, lp, (jnp.int32(0), pcol))

        # combine the per-shard R blocks (two nb x nb psums + CholeskyQR2,
        # Householder-reconstruction kernel -- caqr._bk_combine)
        Rl = jnp.triu(jax.lax.dynamic_slice(lp, (sl, jnp.int32(0)), (nb, nb)))
        Rl = jnp.where(dead, 0, Rl)
        Y_i, N, s, Rfin = _bk_combine(Rl, i, owner, P_, prec, a.dtype)

        # leaf larfb + tree strip psum, full width, masked to cols > panel
        b = larfb(a, V, T, transpose=True, precision=prec)
        strip = jax.lax.dynamic_slice(b, (sl, jnp.int32(0)), (nb, n))
        strip = jnp.where(dead, 0, strip)
        C = jax.lax.psum(
            jnp.einsum("ij,ik->jk", Y_i, strip, precision=prec), ROW_AXIS)
        Z = jnp.einsum("ji,jk->ik", N, C, precision=prec)
        newstrip = strip - jnp.einsum("ij,jk->ik", Y_i, Z, precision=prec)
        upd = jax.lax.dynamic_update_slice(b, newstrip, (sl, jnp.int32(0)))
        b = jnp.where(dead, b, upd)
        a = jnp.where(col_iota >= pcol + nb, b, a)
        return a, ltau[None], T[None], Y_i[None], N, s, Rfin

    kk_arr = jnp.full((mesh.shape[ROW_AXIS],), kk, dtype=jnp.int32)
    return shard_map(
        shard_fn, mesh=mesh,
        in_specs=(P(ROW_AXIS, None), P(ROW_AXIS)),
        out_specs=(P(ROW_AXIS, None), P(ROW_AXIS), P(ROW_AXIS),
                   P(ROW_AXIS), P(), P(), P()),
        check_vma=False,
    )(A, kk_arr)


def caqr_factor_resumable(A, mesh: Mesh, config: QRConfig = DEFAULT_CONFIG,
                          layout: str = "block",
                          checkpoint_path: str | None = None,
                          every: int = 4, combine: str = "bk"):
    """Distributed CAQR with per-panel checkpointing.

    Same result as parallel.caqr.caqr_factor with the matching ``combine``
    (up to fp reordering) -- "bk" (default, like the monolithic path) yields
    CAQRFactorsBK, "allgather" CAQRFactors.  ``checkpoint_path`` is a
    DIRECTORY: each finished
    panel's factors are appended once as ``panel_NNNN.npz`` (never
    rewritten -- snapshot cost is O(1) per panel, not O(k) -- the factor
    history at 65536^2/nb=128 is 512 panels), and ``state.npz`` (the evolving
    matrix + progress meta) is rewritten every ``every`` panels.  A crash
    mid-write never corrupts a finished snapshot (atomic tmp+rename), and a
    rerun of the same call resumes from the last state.npz.  A must already
    be padded/sharded in the layout's storage order (this is the production
    entry point; tests drive it directly).
    """
    import os

    m, n = A.shape
    nb = config.panel_width
    k = n // nb
    P_ = mesh.shape[ROW_AXIS]
    if combine not in ("bk", "allgather"):
        raise ValueError(f"unknown combine {combine!r}")
    bk = combine == "bk"
    # per-panel factor fields, in _panel_step(_bk) return order after A
    fields = (("ltau", "lT", "Y", "N", "s", "Rfin") if bk
              else ("ltau", "lT", "tp", "tT"))

    def panel_file(j):
        return os.path.join(checkpoint_path, f"panel_{j:04d}.npz")

    def state_file():
        return os.path.join(checkpoint_path, "state.npz")

    start = 0
    cols: dict = {f: [] for f in fields}
    if checkpoint_path:
        state, meta = load_state(state_file())
        if state is not None:
            if meta["m"] != m or meta["n"] != n or meta["nb"] != nb or \
               meta["layout"] != layout or meta["P"] != P_ or \
               meta.get("combine", "allgather") != combine:
                raise ValueError(
                    f"checkpoint {checkpoint_path} does not match this "
                    f"problem: {meta} vs m={m} n={n} nb={nb} layout={layout} "
                    f"combine={combine}")
            start = int(meta["next_panel"])
            A = jax.device_put(jnp.asarray(state["A"]), row_sharding(mesh))
            for kk in range(start):
                pstate, _ = load_state(panel_file(kk))
                for f in fields:
                    cols[f].append(pstate[f])

    step = _panel_step_bk if bk else _panel_step
    for kk in range(start, k):
        out = step(A, kk, mesh, config, layout)
        A = out[0]
        for f, v in zip(fields, out[1:]):
            cols[f].append(np.asarray(v))
        done = kk + 1
        if checkpoint_path and done < k:
            # incremental: this panel's factors, written exactly once
            save_state(panel_file(kk), {f: cols[f][-1] for f in fields},
                       {"panel": kk})
            if done % every == 0:
                save_state(state_file(), {"A": A},
                           {"next_panel": done, "m": m, "n": n, "nb": nb,
                            "layout": layout, "P": P_, "combine": combine})

    # assemble factors + R exactly like caqr_factor
    def stk(f):
        return jnp.stack([jnp.asarray(t) for t in cols[f]])

    ltau = jnp.concatenate([jnp.asarray(t) for t in cols["ltau"]], axis=0)
    ltau = ltau.reshape(k, P_, nb).swapaxes(0, 1)
    lT = jnp.concatenate([jnp.asarray(t) for t in cols["lT"]], axis=0)
    lT = lT.reshape(k, P_, nb, nb).swapaxes(0, 1)

    if layout == "cyclic":
        _, inv = cyclic_permutation(m, nb, P_)
        R = jnp.triu(A[jnp.asarray(inv[:n])])
    else:
        R = jnp.triu(A[:n])
    if bk:
        ss, Rfins = stk("s"), stk("Rfin")
        Ys = jnp.concatenate(
            [jnp.asarray(t) for t in cols["Y"]], axis=0)
        Ys = Ys.reshape(k, P_, nb, nb).swapaxes(0, 1)
        for kk in range(k):
            pcol = kk * nb
            # final R rows carry the Yamamoto sign flip (caqr_factor)
            R = R.at[pcol:pcol + nb, pcol:pcol + nb].set(
                jnp.triu(ss[kk][:, None] * Rfins[kk]))
        factors = CAQRFactorsBK(local_packed=A, local_taus=ltau, local_Ts=lT,
                                Ys=Ys, signs=ss, Ns=stk("N"))
        return factors, R
    tpacked, tT = stk("tp"), stk("tT")
    for kk in range(k):
        pcol = kk * nb
        R = R.at[pcol:pcol + nb, pcol:pcol + nb].set(
            jnp.triu(tpacked[kk, :nb]))
    factors = CAQRFactors(local_packed=A, local_taus=ltau, local_Ts=lT,
                          tree_packed=tpacked, tree_Ts=tT)
    return factors, R
