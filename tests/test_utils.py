"""Aux subsystem smoke tests: profiling, debug, errors, geometry."""

import numpy as np
import pytest

from cuda_qr_tpu.utils import debug, errors, geometry, profiling


def test_print_mat(capsys, rng):
    debug.print_mat(rng.standard_normal((20, 20)), name="A", max_dim=4)
    out = capsys.readouterr().out
    assert "A (20x20)" in out and "..." in out


def test_assert_finite(rng):
    debug.assert_finite(rng.standard_normal(8), "ok")
    bad = np.array([1.0, np.nan, 2.0])
    with pytest.raises(errors.QRNumericalError, match="1/3 non-finite"):
        debug.assert_finite(bad, "bad")


def test_shape_errors_are_value_errors():
    assert issubclass(errors.QRShapeError, ValueError)
    import jax.numpy as jnp
    from cuda_qr_tpu.ops.blocked import qr_blocked
    with pytest.raises(errors.QRShapeError):
        qr_blocked(jnp.zeros((4, 8)))


def test_device_memory_stats():
    stats = profiling.device_memory_stats()
    assert isinstance(stats, dict)  # may be empty on CPU


def test_trace_context(tmp_path):
    import jax.numpy as jnp
    with profiling.trace(str(tmp_path / "tr")) as d:
        (jnp.ones((8, 8)) @ jnp.ones((8, 8))).block_until_ready()
    import os
    assert any(os.scandir(d))  # something was written


def test_panel_grid():
    g = geometry.PanelGrid(m=64, n=32, pr=16, pc=8)
    assert g.aligned()
    assert g.row_panels == 7 and g.col_panels == 4
    assert g.tau_index(1, 2, 3) == (7 * 1 + 2) * 8 + 3
    assert not geometry.PanelGrid(m=30, n=8, pr=8, pc=4).aligned()
    starts = geometry.PanelGrid(m=16, n=8, pr=8, pc=4).panel_row_starts()
    assert starts == [8, 4, 0]


def test_reflector_extent():
    # bottom panel: reflectors run to the panel bottom (vend = pr)
    vs, ve = geometry.reflector_extent(8, 2, 0, 8, 4, 16)
    assert (vs, ve) == (2, 8)
    # top panel crossing the diagonal
    vs, ve = geometry.reflector_extent(0, 1, 0, 8, 4, 16)
    assert (vs, ve) == (1, 6)  # vend = pr - pc + col + 1 (qr.c:135)


def test_trace_print_gated(monkeypatch):
    monkeypatch.setenv("CUDA_QR_TRACE", "0")
    debug.trace_print("never {}", 1)  # must be a no-op without jit context
    monkeypatch.setenv("CUDA_QR_TRACE", "1")
    assert debug.trace_enabled()
