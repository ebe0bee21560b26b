"""Checkpoint/resume for long-running factorizations.

The reference has nothing here (single-shot kernel, 10-minute LSF wall
clock as the only watchdog, jobfile:3); a 65536^2 distributed CAQR is a
long-running job whose panel loop is a natural checkpoint boundary.  State
is a pytree of arrays plus a JSON-able meta dict, written atomically
(tmp + rename) so a crash mid-write never corrupts the previous snapshot.
"""

from __future__ import annotations

import json
import os
import tempfile

import jax
import numpy as np


def save_state(path: str, state: dict, meta: dict) -> None:
    """Atomically write {name: array} + meta to ``path`` (.npz)."""
    arrays = {k: np.asarray(jax.device_get(v)) for k, v in state.items()}
    d = os.path.dirname(os.path.abspath(path)) or "."
    os.makedirs(d, exist_ok=True)
    fd, tmp = tempfile.mkstemp(dir=d, suffix=".tmp")
    try:
        with os.fdopen(fd, "wb") as f:
            np.savez(f, __meta__=json.dumps(meta), **arrays)
        os.replace(tmp, path)
    except BaseException:
        if os.path.exists(tmp):
            os.unlink(tmp)
        raise


def load_state(path: str):
    """Returns (state dict of np arrays, meta dict) or (None, None)."""
    if not os.path.exists(path):
        return None, None
    with np.load(path, allow_pickle=False) as z:
        meta = json.loads(str(z["__meta__"]))
        state = {k: z[k] for k in z.files if k != "__meta__"}
    return state, meta
