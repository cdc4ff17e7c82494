"""Custom quantization matrices (x264 --cqm; reference common/set.c
x264_cqm_init + set.h preset tables).

The active CQM is process-level encoder state: the jitted device
programs read the quant/dequant module tables at trace time, so
`set_cqm` swaps them and clears the jit caches (each CQM bakes its own
constants into fresh executables; the persistent compile cache keys on
the HLO, so presets don't collide there either). The decoder side is
per-stream and independent: decoder/recon.py gets its scaling from the
parsed SPS, never from this module.
"""

from __future__ import annotations

import numpy as np

from . import transform as T
from . import transform8 as T8

# JVT sample matrices (reference common/set.h:168-213 x264_cqm_jvt*;
# identical to the spec's Default_4x4/8x8 matrices, raster order)
JVT4I = np.array([
    6, 13, 20, 28,
    13, 20, 28, 32,
    20, 28, 32, 37,
    28, 32, 37, 42], np.int64)
JVT4P = np.array([
    10, 14, 20, 24,
    14, 20, 24, 27,
    20, 24, 27, 30,
    24, 27, 30, 34], np.int64)
JVT8I = T8.JVT8I.reshape(-1)
JVT8P = T8.JVT8P.reshape(-1)

FLAT4 = np.full(16, 16, np.int64)
FLAT8 = np.full(64, 16, np.int64)

# active lists (raster order), flat by default; + luma deadzone bias
# numerators (x264 set.c:76, defaults 21 intra / 11 inter)
_active = {"i4": None, "p4": None, "i8": None, "p8": None,
           "dzi": 21, "dzp": 11}
_version = 0


def version() -> int:
    """Monotonic counter bumped on every effective set_cqm; cache key
    for host-side derived tables (ops/trellis.py)."""
    return _version


def active_lists():
    """(intra4, inter4, intra8, inter8) raster lists or None = flat."""
    return (_active["i4"], _active["p4"], _active["i8"], _active["p8"])


def is_flat() -> bool:
    return all(_active[k] is None for k in ("i4", "p4", "i8", "p8"))


def _norm(v, n):
    if v is None:
        return None
    a = np.asarray(v, np.int64).reshape(-1)
    assert a.size == n and (a > 0).all() and (a <= 255).all(), \
        f"scaling list must be {n} values in 1..255"
    flat = FLAT4 if n == 16 else FLAT8
    return None if np.array_equal(a, flat) else a


def set_cqm(intra4=None, inter4=None, intra8=None, inter8=None,
            dz_intra: int = 21, dz_inter: int = 11) -> None:
    """Install CQM lists (raster order; None = flat) + luma deadzone
    bias numerators. No-op when the active set already matches."""
    new = {"i4": _norm(intra4, 16), "p4": _norm(inter4, 16),
           "i8": _norm(intra8, 64), "p8": _norm(inter8, 64),
           "dzi": int(dz_intra), "dzp": int(dz_inter)}
    same = all(
        (new[k] is None and _active[k] is None)
        or (new[k] is not None and _active[k] is not None
            and np.array_equal(new[k], _active[k])) for k in new)
    if same:
        return
    global _version
    _version += 1
    _active.update(new)
    T.set_scaling4(new["i4"], new["p4"], new["dzi"], new["dzp"])
    T8.set_scaling8(new["i8"], new["p8"], new["dzi"], new["dzp"])
    import jax
    jax.clear_caches()   # retrace with the new table constants


def set_preset(name: str) -> None:
    """x264 --cqm presets (x264.h CQM_FLAT / CQM_JVT)."""
    if name == "flat":
        set_cqm()
    elif name == "jvt":
        set_cqm(JVT4I, JVT4P, JVT8I, JVT8P)
    else:
        raise ValueError(f"unknown cqm preset {name!r}")
