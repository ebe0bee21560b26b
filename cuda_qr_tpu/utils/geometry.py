"""Panel-grid geometry.

The reference computes its panel grid in ``getPanelDims`` (qr.cu:49-55,
qr.c:45-53) and replicates the per-column reflector-extent arithmetic
(vstart/vend, the four bottom/top panel cases) in at least four places
(qr.cu:104-132, 225-249, 363-389; qr.c:108-141).  Here the whole geometry
lives in one module; the sliding-panel vstart/vend logic is only needed by
the oracle-compatible NumPy model (the TPU path uses full-height panels and
has no panel cases), but it is kept as the single source of truth for both.
"""

from __future__ import annotations

import dataclasses


def ceildiv(a: int, b: int) -> int:
    """qr.cu:28."""
    return -(-a // b)


def round_up(x: int, m: int) -> int:
    return ceildiv(x, m) * m


@dataclasses.dataclass(frozen=True)
class PanelGrid:
    """Sliding-panel grid of the reference algorithm (qr.cu:49-55).

    ``col_panels`` = ceil(n / pc); ``row_panels`` = 1 + ceil((m - pr)/(pr - pc))
    for m > pr (one panel otherwise).  tau is laid out
    ``tau[(row_panels * pc_idx + pr_idx) * pc + col]`` (qr.cu:517).
    """

    m: int
    n: int
    pr: int
    pc: int

    def __post_init__(self):
        if self.pc >= self.pr:
            raise ValueError(f"panel cols {self.pc} must be < panel rows {self.pr}")
        if self.n > self.m:
            raise ValueError(f"need n <= m, got {self.m}x{self.n}")

    @property
    def col_panels(self) -> int:
        return ceildiv(self.n, self.pc)

    @property
    def row_panels(self) -> int:
        if self.m <= self.pr:
            return 1
        return 1 + ceildiv(self.m - self.pr, self.pr - self.pc)

    @property
    def tau_len(self) -> int:
        return self.row_panels * self.col_panels * self.pc

    def tau_index(self, pc_idx: int, pr_idx: int, col: int) -> int:
        """qr.cu:517 / qr.cu:616."""
        return (self.row_panels * pc_idx + pr_idx) * self.pc + col

    def aligned(self) -> bool:
        """The reference's hard precondition (SURVEY.md S4): m on the sliding
        grid, n a multiple of pc.  Misaligned inputs silently corrupt the
        reference; the TPU build pads instead (see ``pad_to_grid``)."""
        m_ok = self.m == self.pr or (
            self.m > self.pr and (self.m - self.pr) % (self.pr - self.pc) == 0
        )
        return m_ok and self.n % self.pc == 0

    def panel_row_starts(self):
        """Bottom-to-top panel start rows for one column block (qr.cu:508)."""
        starts = []
        pr_start = self.m - self.pr
        while pr_start > 0:
            starts.append(pr_start)
            pr_start -= self.pr - self.pc
        starts.append(0)
        return starts


def reflector_extent(pr_start: int, col: int, pc_idx: int, pr: int, pc: int,
                     m: int) -> tuple[int, int]:
    """vstart/vend of reflector ``col`` within the panel at row ``pr_start``.

    The four panel cases of qr.cu:104-132, deduplicated:
      bottom panel (pr_start == m - pr): reflector runs to the panel bottom;
      otherwise it stops early, leaving the pc x pc triangular carry-over the
      next (overlapping) panel re-eliminates.
      top panel (panel crosses the diagonal, pr_start <= pc_idx * pc):
      reflector starts at the diagonal row, panel-relative.
    Returns (vstart, vend), half-open, in panel-local row coordinates.
    """
    pcol = pc_idx * pc
    bottom = pr_start == m - pr
    top = pr_start <= pcol
    vstart = (pcol - pr_start + col) if top else col
    vend = pr if bottom else (pr - pc + col + 1)
    return vstart, vend
