"""Syndrome-Trellis Codes: minimal-cost embedding + syndrome extraction.

Reference: /root/reference/embed.h:309-548 (`stc_embed`, a copy of the
Filler/Judas/Fridrich STC toolbox embedder; the parity submatrix comes
from a hardcoded table for h in [7,12] (embed.h:11-132) or an LCG
fallback (embed.h:136-139, 276-306)). The reference calls it with
constraint height 10 (encoder/encoder.c:1843) and never ships an
extractor (the stc_extract include is commented out, analyse.c:43).

This is a from-scratch implementation of the published STC algorithm:

- submatrix columns are generated deterministically from a key with the
  same structural property as the toolbox fallback (first and last row
  set, distinct columns). DIVERGENCE: the exact toolbox table is not
  reproduced, so raw stego bitstreams differ from the reference binary's;
  embed->extract is self-consistent, which is all the reference's own
  pipeline verifies (its message is unseeded rand(), encoder.c:1838).
- block widths follow floor((j+1)n/k) - floor(jn/k) (uniform spread).
- the forward pass is vectorized over all 2^h trellis states (numpy),
  with per-element path bits for the backward traceback.

Conventions: state bit t carries the running parity of message bit
j + t while processing block j; a column's bit t therefore targets
message bit j + t. Columns are masked near the end so no state bit
constrains a nonexistent message bit.
"""

from __future__ import annotations

import numpy as np

INF = np.float64(1e30)


def _lcg(state: int):
    """Deterministic 32-bit LCG (same family as embed.h:136 `myrand`,
    parameters are the classic Numerical-Recipes pair)."""
    while True:
        state = (1664525 * state + 1013904223) & 0xFFFFFFFF
        yield state


def gen_columns(width: int, height: int, key: int = 1) -> np.ndarray:
    """Distinct h-bit columns with first and last row set
    (structure per embed.h:292-303)."""
    assert (1 << max(0, height - 2)) >= width, \
        "cannot generate matrix for this payload; raise stc_h"
    rng = _lcg(key * 2654435761 % (1 << 32) + height * 131 + width)
    mask = (1 << (height - 2)) - 1
    base = (1 << (height - 1)) | 1
    cols: list[int] = []
    while len(cols) < width:
        r = ((next(rng) & mask) << 1) | base
        if r not in cols:
            cols.append(r)
    return np.array(cols, np.uint32)


def block_widths(n: int, k: int) -> np.ndarray:
    """Per-message-bit sub-block widths; sums to n."""
    edges = (np.arange(k + 1) * n) // k
    return np.diff(edges).astype(np.int32)


def stc_embed(cover: np.ndarray, message: np.ndarray, rho: np.ndarray,
              h: int = 10, key: int = 1):
    """Find stego bits y minimizing sum(rho[x != y]) with syndrome(y) ==
    message. Returns (stego_bits [n], total_cost). Raises ValueError if
    k > n."""
    x = np.asarray(cover, np.uint8)
    m = np.asarray(message, np.uint8)
    costs = np.asarray(rho, np.float64)
    n, k = len(x), len(m)
    if k == 0:
        return x.copy(), 0.0
    if k > n:
        raise ValueError("message cannot be longer than the cover")

    widths = block_widths(n, k)
    max_w = int(widths.max())
    cols_tab = gen_columns(max_w, h, key)

    n_states = 1 << h
    price = np.full(n_states, INF)
    price[0] = 0.0
    # path bits: for element i, whether the optimal arrival at state s
    # used y_i = 1
    path = np.zeros((n, n_states), np.uint8)

    states = np.arange(n_states)
    i = 0
    for j in range(k):
        mask = (1 << min(h, k - j)) - 1
        for t in range(int(widths[j])):
            col = int(cols_tab[t]) & mask
            c0 = price + (costs[i] if x[i] == 1 else 0.0)   # y_i = 0
            c1 = price[states ^ col] + (costs[i] if x[i] == 0 else 0.0)
            use1 = c1 < c0
            price = np.where(use1, c1, c0)
            path[i] = use1
            i += 1
        # enforce message bit j, shift state down
        surviving = price[(states << 1 | int(m[j])) & (n_states - 1)]
        # states whose shifted source exceeds h bits are invalid
        valid = (states << 1 | int(m[j])) < n_states
        price = np.where(valid, surviving, INF)
    total = price[0]
    if not np.isfinite(total):
        raise ValueError("syndrome not reachable")

    # backward traceback
    y = np.zeros(n, np.uint8)
    state = 0
    i = n - 1
    for j in range(k - 1, -1, -1):
        state = ((state << 1) | int(m[j])) & (n_states - 1)
        mask = (1 << min(h, k - j)) - 1
        for t in range(int(widths[j]) - 1, -1, -1):
            col = int(cols_tab[t]) & mask
            if path[i, state]:
                y[i] = 1
                state ^= col
            i -= 1
    assert i == -1 and state == 0, (i, state)
    return y, float(total)


def stc_extract(stego: np.ndarray, k: int, h: int = 10,
                key: int = 1) -> np.ndarray:
    """Recover the k message bits from stego cover bits (blind given
    key/h/k): incremental syndrome of the banded parity matrix."""
    y = np.asarray(stego, np.uint8)
    n = len(y)
    if k == 0:
        return np.zeros(0, np.uint8)
    widths = block_widths(n, k)
    cols_tab = gen_columns(int(widths.max()), h, key)
    out = np.zeros(k, np.uint8)
    state = 0
    i = 0
    for j in range(k):
        mask = (1 << min(h, k - j)) - 1
        for t in range(int(widths[j])):
            if y[i]:
                state ^= int(cols_tab[t]) & mask
            i += 1
        out[j] = state & 1
        state >>= 1
    return out
