"""Wet-paper-code embedding simulator.

Reference: embed.h:572-591 `wpc_embed` (+ helpers Hy/Decode
embed.h:551-569) — a stub that flips each dry cover element with
p=0.5, simulating a full-payload wet-paper embedding. Dead code in the
reference (no live call sites, SURVEY.md §2.1); reproduced here for
capability parity and for payload-capacity experiments.
"""

from __future__ import annotations

import numpy as np


def wpc_embed(cover: np.ndarray, wet: np.ndarray,
              key: int = 1) -> np.ndarray:
    """Simulated WPC embedding: dry (changeable) elements flip with
    probability 0.5; wet elements are untouched (embed.h:572-591's
    `if(!wet[i] && rand01()) stego[i] ^= 1`).

    cover: [n] bits; wet: [n] bool (True = wet / unchangeable).
    Returns the stego bit vector."""
    cover = np.asarray(cover, np.uint8)
    wet = np.asarray(wet, bool)
    rng = np.random.RandomState(key & 0x7FFFFFFF or 1)
    flips = (rng.rand(cover.shape[0]) < 0.5) & ~wet
    return cover ^ flips.astype(np.uint8)


def wpc_capacity(wet: np.ndarray) -> int:
    """Payload capacity of a wet-paper channel = number of dry
    elements (Fridrich WPC result; the reference's Hy/Decode pair
    verifies the same)."""
    return int((~np.asarray(wet, bool)).sum())
