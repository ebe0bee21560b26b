"""Collective-traffic regression tests for the distributed CAQR path.

RESULTS.md's scaling analysis rests on a word-count claim: the basis-kernel
(bk) combine moves O(nb^2) words per panel (two nb x nb psums, one nb x nb
per-shard all_gather, one psum of the nb x w trailing strip), while the
allgather combine moves O(P * nb * w) gather words.  Hardware to time this
does not exist in CI, but the claim is *checkable statically*: every
collective the compiled program can ever execute appears in the lowered
StableHLO with its operand shape.  These tests parse that text and fail if
anyone reintroduces an O(P * nb * w) gather into the bk path.

Parsing scope: shard_map's psum lowers to "stablehlo.all_reduce" and
all_gather to "stablehlo.all_gather" (channel ops); local jnp.sum reductions
lower to plain stablehlo.reduce and are ignored.  Counts are static -- the
lax.cond fallback branches (Householder combine) contribute their
collectives too, which is intended: the assertion budget below includes
them explicitly.
"""

import re

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cuda_qr_tpu.parallel.caqr import caqr_factor
from cuda_qr_tpu.parallel.mesh import ROW_AXIS
from cuda_qr_tpu.utils.config import QRConfig

# One shared geometry: P=8 shards, k=4 panels of nb=32, m=256, n=128.
P_ = 8
NB = 32
M, N = 256, 128
K = N // NB

_AR = re.compile(
    r'"stablehlo\.all_reduce".*?\}\) : \(tensor<([0-9x]+)x[a-z0-9]+>\)',
    re.DOTALL)
_AG = re.compile(
    r'"stablehlo\.all_gather"\(.*?tensor<([0-9x]+)x[a-z0-9]+>\) -> '
    r'tensor<([0-9x]+)x[a-z0-9]+>')


def _dims(s: str):
    return tuple(int(d) for d in s.split("x"))


def _collectives(layout: str, combine: str):
    mesh = jax.sharding.Mesh(np.array(jax.devices()[:P_]), (ROW_AXIS,))
    cfg = QRConfig(panel_width=NB, dtype=jnp.float32, use_chol_kernel=False)
    A = jnp.zeros((M, N), jnp.float32)
    low = jax.jit(
        lambda a: caqr_factor(a, mesh, cfg, layout, combine)).lower(A)
    txt = low.as_text()
    ars = [_dims(m.group(1)) for m in _AR.finditer(txt)]
    ags = [(_dims(m.group(1)), _dims(m.group(2))) for m in _AG.finditer(txt)]
    assert ars or ags, "parser found no collectives -- lowering format changed?"
    return ars, ags


@pytest.fixture(scope="module")
def bk():
    return _collectives("block", "bk")


@pytest.fixture(scope="module")
def allgather():
    return _collectives("block", "allgather")


def _payload(shape):
    """Element count and trailing dim, ignoring leading singleton axes the
    lowering may add around the gathered block."""
    n = 1
    for d in shape:
        n *= d
    return n, shape[-1]


def test_bk_no_trailing_width_gather(bk):
    """THE regression guard: the bk path must never gather trailing strips.

    Every all_gather operand must hold exactly nb x nb elements -- the
    per-shard M block (executed) or R block (inside the Householder-
    fallback cond branch).  An operand whose trailing dim exceeds nb means
    someone reintroduced the O(P*nb*w) gather the bk combine exists to
    avoid.
    """
    _, ags = bk
    for operand, result in ags:
        count, last = _payload(operand)
        assert count == NB * NB and last == NB, (
            f"bk path gathers a {operand} tensor; only (nb, nb) blocks "
            f"may cross the wire")


def test_bk_all_reduce_word_budget(bk):
    """Exact psum inventory for the bk combine (all unconditional, so the
    static parse equals the executed set):

    per panel kk (w = N - (kk+1)*nb trailing columns):
      2 x psum(nb x nb)            Gram + CholeskyQR2 round 2
      1 x psum(nb x nb)  if w > 0  lookahead strip (next panel's columns)
      1 x psum(nb x (w - nb)) if w > nb   wide trailing strip
    """
    ars, _ = bk
    expected = []
    for kk in range(K):
        w = N - (kk + 1) * NB
        expected += [(NB, NB), (NB, NB)]
        if w > 0:
            expected += [(NB, NB)]
        if w > NB:
            expected += [(NB, w - NB)]
    assert sorted(ars) == sorted(expected), (
        f"psum inventory drifted: got {sorted(ars)}, "
        f"expected {sorted(expected)}")
    words = sum(a * b for a, b in ars)
    budget = sum(a * b for a, b in expected)
    assert words == budget


def test_bk_all_gather_inventory(bk):
    """Static all_gather count: one executed (nb, nb) -> (P*nb, nb) gather
    of the M blocks per panel, plus one more inside the Householder-
    fallback lax.cond branch -- 2k total, all (nb, nb) operands."""
    _, ags = bk
    assert len(ags) == 2 * K
    for operand, result in ags:
        assert _payload(operand) == (NB * NB, NB)
        assert _payload(result) == (P_ * NB * NB, NB)


def test_allgather_combine_moves_P_nb_w_words(allgather):
    """Parser sanity + contrast: the allgather combine DOES gather trailing
    strips of width w -- (nb, w) -> (P*nb, w) per panel -- which is exactly
    the traffic the bk path eliminates."""
    _, ags = allgather
    strip_gathers = [(op, res) for op, res in ags if op[-1] > NB]
    expected_ws = sorted(N - (kk + 1) * NB
                         for kk in range(K) if N - (kk + 1) * NB > NB)
    assert sorted(op[-1] for op, _ in strip_gathers) == expected_ws
    for operand, result in strip_gathers:
        w = operand[-1]
        assert _payload(operand) == (NB * w, w)
        assert _payload(result) == (P_ * NB * w, w)


def test_bk_vs_allgather_word_ratio(bk, allgather):
    """The headline claim, in words: summed over all panels, the allgather
    combine's gather traffic exceeds the bk combine's total collective
    words (P-fold on the strips) even at this tiny size."""
    ars_bk, ags_bk = bk
    _, ags_all = allgather
    # received words per shard: all_reduce ~ operand size; all_gather ~
    # result size (each shard materializes the full gathered stack)
    def _count(shape):
        n = 1
        for d in shape:
            n *= d
        return n

    bk_words = (sum(_count(s) for s in ars_bk)
                + sum(_count(r) for _, r in ags_bk))
    all_words = sum(_count(r) for _, r in ags_all)
    assert all_words > bk_words, (bk_words, all_words)
