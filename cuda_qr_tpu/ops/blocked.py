"""Blocked Householder QR driver (geqrf) and Q operators (orgqr/ormqr).

This is the TPU replacement for the reference's ``mmqr`` driver
(qr.cu:475-553).  Where the reference slides PR-tall panels bottom-to-top to
fit a 48 KiB shared memory budget (qr.cu:505-508) -- serializing the machine
on one CUDA block per panel step -- the TPU has ~16 MB of VMEM per core, so
each panel is factored *full height* in one shot (VMEM easily holds an
8192 x 128 fp32 panel) and the trailing update is a handful of large MXU
GEMMs.  The panel loop is a Python unroll over n/nb statically-shaped steps:
every shape is static under jit, row/column ranges shrink per panel, and XLA
schedules the whole factorization as one fused program.

Factor storage is (packed, taus, Ts):
  packed: (m_pad, n_pad) LAPACK packed V/R, unit-lower V below the diagonal
          (reference layout, qr.cu:184-197 / qr.cu:316-325);
  taus:   (k, nb) per-panel reflector scales (reference tau array,
          qr.cu:517, but on a dense full-height panel grid);
  Ts:     (k, nb, nb) per-panel compact-WY T factors (the reference instead
          re-materializes W = -V T per panel step through global memory,
          qr.cu:495).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..utils.config import DEFAULT_CONFIG, QRConfig
from ..utils.geometry import round_up
from .householder import (_einsum, _h, geqr2, larfb, larft, merge_wy,
                          panel_v, unit_vj, unpack_r, unpack_v)


def _merge_group(Vs, Ts, prec):
    """Pair-merge a list of per-panel (V, T) into one wide (V, T).

    len(Vs) must be a power of two; panels are ordered left-to-right (the
    composed operator is P_0 P_1 ... P_{g-1})."""
    Vs, Ts = list(Vs), list(Ts)
    while len(Vs) > 1:
        nVs, nTs = [], []
        for a in range(0, len(Vs), 2):
            nTs.append(merge_wy(Vs[a], Ts[a], Vs[a + 1], Ts[a + 1], prec))
            nVs.append(jnp.concatenate([Vs[a], Vs[a + 1]], axis=1))
        Vs, Ts = nVs, nTs
    return Vs[0], Ts[0]


def _group_width(kg: int, aggregate: int) -> int:
    """Largest power-of-two group size <= aggregate that divides kg."""
    g = 1
    while g * 2 <= aggregate and kg % (g * 2) == 0:
        g *= 2
    return g


class PackedQR(NamedTuple):
    """Packed blocked-QR factors (a JAX pytree; all leaves are arrays).

    VJs holds each panel's nb x nb diagonal V block explicitly: for
    Householder-style panels it is the redundant unit-lower block (so
    ``panel_v`` is one uniform gather for every panel method); for
    basis-kernel panels (panel_method="cholqr2_bk") it is a dense block that
    cannot be packed under R at all.
    """
    packed: jnp.ndarray   # (m_pad, n_pad)
    taus: jnp.ndarray     # (k, nb)
    Ts: jnp.ndarray       # (k, nb, nb)
    VJs: jnp.ndarray      # (k, nb, nb)


def _panel_factor(panel: jnp.ndarray, off: int, config: QRConfig):
    """Factor rows >= off of a full-height (m_pad x nb) panel.

    Returns (packed_panel, tau, T, VJ) with T the compact-WY factor of the
    panel's reflectors and VJ the diagonal V block.  Dispatch per
    config.panel_method (with the legacy use_pallas=False escape hatch
    forcing the jnp path).
    """
    nb = panel.shape[1]
    method = config.panel_method if config.use_pallas else "geqr2"
    if method == "cholqr2_hr":
        from .fast_panel import panel_factor_cholqr2hr
        packed, tau, T = panel_factor_cholqr2hr(panel, off, config)
        return packed, tau, T, unit_vj(packed, off, nb)
    if method == "cholqr2_bk":
        from .fast_panel import panel_factor_cholqr2bk
        return panel_factor_cholqr2bk(panel, off, config)
    if method == "geqrt":
        from .geqrt import geqrt_panel  # local import: optional dependency cycle
        packed, tau, T = geqrt_panel(panel, off, config)
        return packed, tau, T, unit_vj(packed, off, nb)
    lo = panel[off:]
    lo_packed, tau = geqr2(lo, row_offset=0, precision=config.precision)
    V = unpack_v(lo_packed, 0)
    T = larft(V, tau, precision=config.precision)
    packed = jnp.concatenate([panel[:off], lo_packed], axis=0) if off else lo_packed
    return packed, tau, T, unit_vj(packed, off, nb)


def _pad(A: jnp.ndarray, nb: int):
    m, n = A.shape
    m_pad, n_pad = round_up(m, nb), round_up(n, nb)
    if (m_pad, n_pad) != (m, n):
        A = jnp.pad(A, ((0, m_pad - m), (0, n_pad - n)))
    return A


def _unpack_v_dyn(packed: jnp.ndarray, off) -> jnp.ndarray:
    m, n = packed.shape
    r = jax.lax.broadcasted_iota(jnp.int32, (m, n), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (m, n), 1) + jnp.asarray(off, jnp.int32)
    return jnp.where(r > c, packed, jnp.where(r == c, 1, 0).astype(packed.dtype))


def _qr_blocked_scan(A: jnp.ndarray, config: QRConfig) -> PackedQR:
    """Staged scan driver.

    Panels are processed in config.scan_stages equal groups; each stage's
    lax.fori_loop body operates on the statically-sliced trailing submatrix
    (rows/columns before the stage's first panel are provably never touched
    by its panels), so the full-width-masked update waste shrinks toward
    exact slicing while trace/compile cost stays O(stages), not O(panels) --
    the binding constraint on this stack, where Mosaic compiles per Pallas
    instance and the panel graphs are deep.

    The trailing matrix is never round-tripped through the full A inside the
    loops: each stage consumes the live trailing submatrix and returns its
    finalized packed columns, the final rows of everything to its right
    (``top``: rows no later panel can touch), and the live remainder.  The
    full packed matrix is assembled ONCE at the end from static concats --
    measured at 8192^2, per-panel writes into a carried full A cost more
    than the trailing GEMMs themselves (docs/PERF.md).
    """
    m_pad, n_pad = A.shape
    nb = config.panel_width
    k = n_pad // nb
    if config.stage_schedule is not None:
        sched = list(config.stage_schedule)
        if any(c <= 0 for c in sched) or sum(sched) != k:
            raise ValueError(
                f"stage_schedule {config.stage_schedule} must be positive "
                f"and sum to the panel count k={k}")
        bounds = [0]
        for c in sched:
            bounds.append(bounds[-1] + c)
    else:
        stages = max(1, min(config.scan_stages, k))
        bounds = [round(s * k / stages) for s in range(stages + 1)]
    taus_all, Ts_all, VJs_all = [], [], []
    stage_cols = []   # per stage: packed columns (rows r0:, width kg*nb)
    tops = []         # per stage: (r0, r1, final rows [r0, r1) of cols r1:)
    T_mat = A
    for ks, ke in zip(bounds[:-1], bounds[1:]):
        if ke == ks:
            continue
        r0, r1 = ks * nb, ke * nb
        g, T_rest = _scan_panels(T_mat, ke - ks, config)
        stage_cols.append(g.packed)
        taus_all.append(g.taus)
        Ts_all.append(g.Ts)
        VJs_all.append(g.VJs)
        tops.append((r0, r1, T_rest[:r1 - r0]))
        T_mat = T_rest[r1 - r0:]
    # Assemble: column block s = [tops of earlier stages; its packed rows].
    blocks = []
    for s, cols in enumerate(stage_cols):
        r0 = tops[s][0]
        above = [t[:, r0 - ur1:r0 - ur1 + cols.shape[1]]
                 for (ur0, ur1, t) in tops[:s]]
        blocks.append(jnp.concatenate(above + [cols], axis=0))
    packed = jnp.concatenate(blocks, axis=1)
    return PackedQR(packed=packed, taus=jnp.concatenate(taus_all),
                    Ts=jnp.concatenate(Ts_all), VJs=jnp.concatenate(VJs_all))


def _scan_panels(A: jnp.ndarray, k: int, config: QRConfig):
    """fori_loop over the first k panels of a trailing (sub)matrix whose
    panel 0 starts at its own top-left corner.

    Returns (PackedQR-of-stage, T_rest): the PackedQR's ``packed`` holds the
    k finalized panel COLUMN blocks (full submatrix height); T_rest is the
    updated remainder A[:, k*nb:].

    Panels are processed in lookahead groups of g = factor_lookahead (when
    it divides k): a group slices its g*nb columns out of A ONCE, factors
    them LEFT-LOOKING -- an inner fori_loop in which member l first applies
    the group's earlier reflectors (pulled from stacked V/T side arrays) to
    its own block, then factors it -- stores each packed panel into a
    stacked (k, m, nb) side array (never written back into A -- per-panel
    writes into the carried submatrix cost more than the trailing GEMMs,
    docs/PERF.md), and applies ONE merged g*nb-deep masked block reflector
    to A.  The group's own columns in A go stale; the side stack is the
    source of truth, reassembled as one transpose+reshape at the end.

    Left-looking vs the earlier right-looking unroll: identical FLOPs and
    per-column floating-point order (each block receives V_0..V_{l-1} in
    sequence either way), but the panel graph -- the largest subgraph in
    the program, instantiated per inlined call site -- appears ONCE per
    stage instead of g times.  Measured at 8192^2/s16 this is the
    difference between a ~227 MB and a ~60 MB serialized executable, i.e.
    between ~25 min and a few min of remote compile/cache-load through the
    device tunnel (docs/PERF.md "Compile economics").
    """
    m_sub, n_sub = A.shape
    nb = config.panel_width
    prec = config.resolved_trailing_precision()
    g = _group_width(k, config.factor_lookahead)
    cmask_iota = jax.lax.broadcasted_iota(jnp.int32, (1, n_sub), 1)
    tdt = jnp.float32 if A.dtype == jnp.bfloat16 else A.dtype

    def _members(cols, i0, Ps, taus, Ts, VJs):
        """Left-looking member loop over one group's g panels.

        cols: the group's (m_sub, g*nb) columns; i0: the group's first
        panel index (traced or static).  Returns the stacked V/T for the
        group merge plus the updated side arrays."""
        i0 = jnp.asarray(i0, jnp.int32)  # static 0 is int64 under x64

        def member(l, mc):
            l = jnp.asarray(l, jnp.int32)
            Vstk, Tstk, Ps, taus, Ts, VJs = mc
            i = i0 + l
            off = i * nb
            block = jax.lax.dynamic_slice(cols, (jnp.int32(0), l * nb),
                                          (m_sub, nb))

            def apply_prev(jj, b):
                jj = jnp.asarray(jj, jnp.int32)
                Vj = jax.lax.dynamic_slice(
                    Vstk, (jj, jnp.int32(0), jnp.int32(0)),
                    (1, m_sub, nb))[0]
                Tj = jax.lax.dynamic_slice(
                    Tstk, (jj, jnp.int32(0), jnp.int32(0)), (1, nb, nb))[0]
                return larfb(b, Vj, Tj, transpose=True,
                             precision=prec).astype(b.dtype)

            block = jax.lax.fori_loop(0, l, apply_prev, block)
            packed, tau, T, VJ = _panel_factor_dyn(block, off, config)
            V = panel_v(packed, off, VJ)
            Vstk = jax.lax.dynamic_update_slice(
                Vstk, V[None].astype(Vstk.dtype),
                (l, jnp.int32(0), jnp.int32(0)))
            # Panel methods may return bf16 tau/T; the carries are float32
            # for bf16 inputs, so cast to the carry dtype before updating.
            Tstk = jax.lax.dynamic_update_slice(
                Tstk, T[None].astype(Tstk.dtype),
                (l, jnp.int32(0), jnp.int32(0)))
            Ps = jax.lax.dynamic_update_slice(
                Ps, packed[None].astype(Ps.dtype),
                (i, jnp.int32(0), jnp.int32(0)))
            taus = jax.lax.dynamic_update_slice(
                taus, tau[None].astype(taus.dtype), (i, jnp.int32(0)))
            VJs = jax.lax.dynamic_update_slice(
                VJs, VJ[None].astype(VJs.dtype),
                (i, jnp.int32(0), jnp.int32(0)))
            return Vstk, Tstk, Ps, taus, Ts, VJs

        Vstk0 = jnp.zeros((g, m_sub, nb), A.dtype)
        Tstk0 = jnp.zeros((g, nb, nb), tdt)
        Vstk, Tstk, Ps, taus, Ts, VJs = jax.lax.fori_loop(
            0, g, member, (Vstk0, Tstk0, Ps, taus, Ts, VJs))
        # Ts carries ALL k panels; the stage's g fresh ones come from Tstk.
        Ts = jax.lax.dynamic_update_slice(
            Ts, Tstk.astype(Ts.dtype), (i0, jnp.int32(0), jnp.int32(0)))
        # merge the group's reflectors (unrolled log-depth tree of GEMMs)
        Vs = [Vstk[l] for l in range(g)]
        Tl = [Tstk[l] for l in range(g)]
        V, T = _merge_group(Vs, Tl, prec)
        return V, T, Ps, taus, Ts, VJs

    Ps0 = jnp.zeros((k, m_sub, nb), A.dtype)
    taus0 = jnp.zeros((k, nb), tdt)
    Ts0 = jnp.zeros((k, nb, nb), tdt)
    VJs0 = jnp.zeros((k, nb, nb), tdt)

    if k == g:
        # One group in this stage (the common case: scan_stages sized so
        # each stage holds exactly one lookahead group, e.g. 8192^2 s16).
        # Offsets are STATIC, so the wide trailing update runs at its exact
        # width -- no full-width mask, which at s16/8192^2 discards ~12% of
        # the trailing GEMM volume (the group's own g*nb dead columns per
        # stage, worst at late stages where they are the whole width).
        V, T, Ps, taus, Ts, VJs = _members(
            A[:, :g * nb], 0, Ps0, taus0, Ts0, VJs0)
        rest = A[:, g * nb:]
        if rest.shape[1]:
            W = _einsum("ri,rj->ij", _h(V), rest, precision=prec)
            W = _einsum("ij,ik->jk", _h(T), W, precision=prec)
            rest = (rest - _einsum("ri,ij->rj", V, W,
                                   precision=prec)).astype(A.dtype)
        packed_cols = jnp.swapaxes(Ps, 0, 1).reshape(m_sub, k * nb)
        return (PackedQR(packed=packed_cols, taus=taus, Ts=Ts, VJs=VJs),
                rest)

    def body(j, carry):
        j = jnp.asarray(j, jnp.int32)  # fori index is int64 under x64
        A, Ps, taus, Ts, VJs = carry
        i0 = j * g
        cols = jax.lax.dynamic_slice(A, (jnp.int32(0), i0 * nb),
                                     (m_sub, g * nb))
        V, T, Ps, taus, Ts, VJs = _members(cols, i0, Ps, taus, Ts, VJs)
        end = (i0 + g) * nb
        W = _einsum("ri,rj->ij", _h(V), A, precision=prec)      # V^H A
        W = _einsum("ij,ik->jk", _h(T), W, precision=prec)      # T^H (V^H A)
        U = _einsum("ri,ij->rj", V, W, precision=prec)          # V (...)
        A = A - jnp.where(cmask_iota >= end, U, 0).astype(A.dtype)
        return A, Ps, taus, Ts, VJs

    A, Ps, taus, Ts, VJs = jax.lax.fori_loop(
        0, k // g, body, (A, Ps0, taus0, Ts0, VJs0))
    packed_cols = jnp.swapaxes(Ps, 0, 1).reshape(m_sub, k * nb)
    return (PackedQR(packed=packed_cols, taus=taus, Ts=Ts, VJs=VJs),
            A[:, k * nb:])


@partial(jax.jit, static_argnames=("config",))
def _panel_factor_dyn(panel: jnp.ndarray, off, config: QRConfig):
    """_panel_factor with a traced offset (scan driver).

    Nested-jit on purpose: the panel graph (CholeskyQR2 + Newton/LU + three
    lax.cond fallback branches) is by far the largest subgraph in the
    blocked driver, and the staged-scan/lookahead structure instantiates it
    stages x group_width times.  As a nested jit it lowers to ONE shared
    StableHLO function per panel shape instead of being inlined at every
    call site -- measured at 8192^2/16 stages: trace+lower 297 s -> 69 s,
    lowered text 100 MB -> 26 MB, with XLA's inliner free to fuse as before
    (the call boundary exists only in the unoptimized program, so steady-
    state performance is unchanged).
    """
    nb = panel.shape[1]
    method = config.panel_method if config.use_pallas else "geqr2"
    if method == "cholqr2_hr":
        from .fast_panel import panel_factor_cholqr2hr
        packed, tau, T = panel_factor_cholqr2hr(panel, off, config)
        return packed, tau, T, unit_vj(packed, off, nb)
    if method == "cholqr2_bk":
        from .fast_panel import panel_factor_cholqr2bk
        return panel_factor_cholqr2bk(panel, off, config)
    if method == "geqrt":
        # Same guards as geqrt_panel: fp64 / too-tall panels fall back to the
        # jnp path; bf16 is computed in fp32 and cast back.
        if (panel.dtype != jnp.float64
                and panel.shape[0] <= config.max_vmem_panel_rows):
            from .geqrt import _geqrt_recursive
            if panel.dtype == jnp.bfloat16:
                packed, tau, T = _geqrt_recursive(
                    panel.astype(jnp.float32), off, config)
                packed = packed.astype(jnp.bfloat16)
            else:
                packed, tau, T = _geqrt_recursive(panel, off, config)
            return packed, tau, T, unit_vj(packed, off, nb)
    from .householder import geqr2_dyn
    packed, tau = geqr2_dyn(panel, off, precision=config.precision)
    T = larft(_unpack_v_dyn(packed, off), tau, precision=config.precision)
    return packed, tau, T, unit_vj(packed, off, nb)


@partial(jax.jit, static_argnames=("config",))
def qr_blocked(A: jnp.ndarray, config: QRConfig = DEFAULT_CONFIG) -> PackedQR:
    """Blocked QR factorization of A (m x n, m >= n after internal padding).

    Arbitrary m, n are handled by zero-padding to the panel grid -- removing
    the reference's hard alignment precondition under which misaligned sizes
    silently corrupt the factorization (SURVEY.md S4, qr.cu:722-734).
    Driver (scan vs unrolled) per config.driver.
    """
    m, n = A.shape
    if m < n:
        from ..utils.errors import QRShapeError
        raise QRShapeError(f"qr_blocked requires m >= n, got {m}x{n}")
    if config.stage_schedule is not None and config.driver != "scan":
        # ADVICE r4: without this, a schedule is silently ignored by the
        # unrolled driver (and a mis-summed one never even gets validated).
        raise ValueError(
            f"stage_schedule is a scan-driver knob; driver={config.driver!r} "
            "ignores it (use driver='scan' or drop the schedule)")
    if jnp.iscomplexobj(A):
        # Complex QR (LAPACK cgeqrf semantics): the Householder core
        # (geqr2/larft/larfb) is Hermitian-transpose aware; the CholeskyQR2
        # and Pallas fast paths are real-only, so route panels to geqr2.
        config = config.replace(dtype=A.dtype, use_pallas=False,
                                use_chol_kernel=False)
    nb = config.panel_width
    A = _pad(A.astype(config.dtype), nb)
    m_pad, n_pad = A.shape
    k = n_pad // nb

    if config.driver == "scan":
        return _qr_blocked_scan(A, config)

    taus, Ts, VJs = [], [], []
    cols = [None] * k
    for i in range(k):
        off = i * nb
        panel = A[:, off:off + nb]
        panel, tau, T, VJ = _panel_factor(panel, off, config)
        cols[i] = panel
        taus.append(tau)
        Ts.append(T)
        VJs.append(VJ)
        if off + nb < n_pad:
            V = panel_v(panel, off, VJ)[off:]
            trail = larfb(A[off:, off + nb:], V, T, transpose=True,
                          precision=config.resolved_trailing_precision(),
                          ).astype(A.dtype)
            A = jnp.concatenate(
                [A[:, :off + nb],
                 jnp.concatenate([A[:off, off + nb:], trail], axis=0)], axis=1)
    packed = jnp.concatenate(cols, axis=1)
    return PackedQR(packed=packed, taus=jnp.stack(taus), Ts=jnp.stack(Ts),
                    VJs=jnp.stack(VJs))


def _apply_panels_scan(packed: jnp.ndarray, Ts: jnp.ndarray, VJs: jnp.ndarray,
                       B: jnp.ndarray,
                       transpose: bool, config: QRConfig) -> jnp.ndarray:
    """Apply all panel block-reflectors to B via staged scans.

    Panel i only touches rows >= i*nb (V is zero above its offset), so no
    column/row masking is needed inside a stage; stages statically slice the
    dead top rows away, and each stage is one lax.fori_loop body -- O(stages)
    trace/compile cost like the factorization driver.
    """
    m_pad, n_pad = packed.shape
    nb = config.panel_width
    k = n_pad // nb
    prec = config.resolved_orgqr_precision()
    stages = max(1, min(config.scan_stages, k))
    bounds = [round(s * k / stages) for s in range(stages + 1)]
    groups = list(zip(bounds[:-1], bounds[1:]))

    def stage(B, packed_sub, Ts_all, VJs_all, ks, ke, transpose):
        kg = ke - ks
        g = _group_width(kg, config.apply_aggregate)

        def body(j, B):
            j = jnp.asarray(j, jnp.int32)
            jg = j if transpose else (jnp.int32(kg // g) - 1 - j)
            Vs, Tl = [], []
            for l in range(g):
                i = jnp.int32(ks) + jg * g + l
                off = i * nb - ks * nb
                panel = jax.lax.dynamic_slice(
                    packed_sub, (jnp.int32(0), off),
                    (packed_sub.shape[0], nb))
                VJ = jax.lax.dynamic_slice(
                    VJs_all, (i, jnp.int32(0), jnp.int32(0)), (1, nb, nb))[0]
                Vs.append(panel_v(panel, off, VJ))
                Tl.append(jax.lax.dynamic_slice(
                    Ts_all, (i, jnp.int32(0), jnp.int32(0)),
                    (1, nb, nb))[0].astype(B.dtype))
            V, T = _merge_group(Vs, Tl, prec)
            return larfb(B, V, T, transpose=transpose,
                         precision=prec).astype(B.dtype)

        return jax.lax.fori_loop(0, kg // g, body, B)

    order = groups if transpose else list(reversed(groups))
    for ks, ke in order:
        if ke == ks:
            continue
        r0 = ks * nb
        Bsub = stage(B[r0:], packed[r0:, r0:], Ts, VJs, ks, ke, transpose)
        B = B.at[r0:].set(Bsub)
    return B


@partial(jax.jit, static_argnames=("m", "n", "config"))
def orgqr(factors: PackedQR, m: int, n: int,
          config: QRConfig = DEFAULT_CONFIG) -> jnp.ndarray:
    """Form thin explicit Q (m x n) from packed factors.

    Production-grade replacement for the reference's verification-only
    explicitQR (qr.cu:582-686), which multiplies a dense m x m H per
    reflector into Q (O(m^3) each); here each *panel* costs three GEMMs:
    Q <- Q - V T (V^T Q), applied last panel to first.

    Structure exploited: when panel i is applied (reverse order), every
    column j < i*nb of the accumulating Q is still exactly e_j (panels
    >= i only mix rows >= i*nb, and e_j's single 1 sits above them), so
    each stage operates on the diagonal-trailing SUBMATRIX -- rows AND
    columns sliced -- halving the GEMM volume vs a full-width sweep.
    """
    packed, taus, Ts, VJs = factors
    m_pad, n_pad = packed.shape
    nb = config.panel_width
    k = n_pad // nb
    prec = config.resolved_orgqr_precision()
    stages = max(1, min(config.scan_stages, k))
    bounds = [round(s * k / stages) for s in range(stages + 1)]
    Q = jnp.eye(m_pad, n, dtype=packed.dtype)

    for ks, ke in reversed(list(zip(bounds[:-1], bounds[1:]))):
        if ke == ks:
            continue
        r0 = ks * nb
        c0 = min(ks * nb, n)
        sub = Q[r0:, c0:]
        psub = packed[r0:, r0:]
        kg = ke - ks
        g = _group_width(kg, config.apply_aggregate)

        def body(j, B, psub=psub, ks=ks, kg=kg, g=g):
            j = jnp.asarray(j, jnp.int32)
            jg = jnp.int32(kg // g) - 1 - j
            Vs, Tl = [], []
            for l in range(g):
                i = jnp.int32(ks) + jg * g + l
                off = (i - ks) * nb
                panel = jax.lax.dynamic_slice(
                    psub, (jnp.int32(0), off), (psub.shape[0], nb))
                VJ = jax.lax.dynamic_slice(
                    VJs, (i, jnp.int32(0), jnp.int32(0)), (1, nb, nb))[0]
                Vs.append(panel_v(panel, off, VJ))
                Tl.append(jax.lax.dynamic_slice(
                    Ts, (i, jnp.int32(0), jnp.int32(0)),
                    (1, nb, nb))[0].astype(B.dtype))
            V, T = _merge_group(Vs, Tl, prec)
            return larfb(B, V, T, transpose=False,
                         precision=prec).astype(B.dtype)

        sub = jax.lax.fori_loop(0, kg // g, body, sub)
        Q = Q.at[r0:, c0:].set(sub)
    return Q[:m]


@partial(jax.jit, static_argnames=("transpose", "config"))
def ormqr(factors: PackedQR, B: jnp.ndarray, transpose: bool = True,
          config: QRConfig = DEFAULT_CONFIG) -> jnp.ndarray:
    """Apply Q^T (transpose=True) or Q to B (m x p) without forming Q."""
    packed, taus, Ts, VJs = factors
    m_pad, n_pad = packed.shape
    mB = B.shape[0]
    if mB < m_pad:
        B = jnp.pad(B, ((0, m_pad - mB), (0, 0)))
    B = _apply_panels_scan(packed, Ts, VJs, B, transpose=transpose,
                           config=config)
    return B[:mB]


def extract_r(factors: PackedQR, n: int, square: bool = True) -> jnp.ndarray:
    """R from packed storage (upper triangle; qr.cu:585-594 analog)."""
    R = unpack_r(factors.packed[:, :n], 0)
    return R[:n] if square else R
