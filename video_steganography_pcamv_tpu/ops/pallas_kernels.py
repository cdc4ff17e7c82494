"""Pallas TPU kernels for the hot compute paths.

Reference hot loops these replace (SURVEY.md §3.4-3.5):

- `fullpel_search_pallas`: exhaustive full-pel SAD search (me.c:483 ESA).
  The jnp version (encoder/me.py) dispatches one whole-frame pass per
  displacement — (2R+1)^2 kernel launches through HBM. Here each grid
  step pins one MB row's current strip + search window in VMEM and sweeps
  every displacement with VPU abs-diff + an MXU block-sum matmul, so HBM
  is touched exactly once per pixel.

Block-sum trick: SAD per MB = ones(1,16) . |cur-ref| . S where
S[w, mbw] is the 0/1 column-grouping matrix — turns the awkward
lane-block reduction into a thin f32 matmul (exact below 2^24).

All kernels have jnp twins and are fuzz-tested against them (checkasm
model, SURVEY.md §4.1); interpret mode covers CPU CI.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _se_bits(v):
    """bits of se(v) for traced int v, exact via threshold counts
    (bs.h:219 code lengths)."""
    ue = jnp.where(v <= 0, -2 * v, 2 * v - 1)
    u = ue + 1
    n = jnp.int32(0)
    for k in range(1, 9):
        n = n + (u >= (1 << k)).astype(jnp.int32)
    return 1 + 2 * n


def _fullpel_kernel(cur_ref, win_ref, ssum_ref, lam_ref, out_ref, *,
                    rng: int, mbw: int):
    cur = cur_ref[...].astype(jnp.float32)          # [16, w]
    s = ssum_ref[...]                                # [w, mbw] f32
    lam = lam_ref[0, 0]                              # SMEM scalar (traced)
    w = cur.shape[1]
    span = 2 * rng + 1

    init = (jnp.full((1, mbw), 1e30, jnp.float32),
            jnp.zeros((1, mbw), jnp.int32),
            jnp.zeros((1, mbw), jnp.int32))
    carry = init
    # dy unrolled (static sublane slices); dx swept with a dynamic lane
    # rotate (Mosaic forbids dynamic sublane offsets, and dynamic lane
    # slices; roll is the supported primitive)
    for dy in range(span):
        strip = win_ref[0, dy:dy + 16, :].astype(jnp.float32)
        mvc_y = lam * _se_bits(jnp.int32(4 * (dy - rng)))

        def body(dx, c, strip=strip, mvc_y=mvc_y):
            best_cost, best_dx, best_dy = c
            rolled = pltpu.roll(strip, -dx, axis=1)
            d = jnp.abs(cur - rolled[:, :w])
            rowsum = jnp.sum(d, axis=0, keepdims=True)       # [1, w]
            sad = jnp.dot(rowsum, s,
                          preferred_element_type=jnp.float32)  # [1, mbw]
            mvc = mvc_y + lam * _se_bits(4 * (dx - rng))
            cost = sad + mvc.astype(jnp.float32)
            better = cost < best_cost
            best_cost = jnp.where(better, cost, best_cost)
            best_dx = jnp.where(better, dx - rng, best_dx)
            best_dy = jnp.where(better, jnp.int32(dy - rng), best_dy)
            return best_cost, best_dx, best_dy

        carry = jax.lax.fori_loop(0, span, body, carry)

    best_cost, best_dx, best_dy = carry
    out_ref[0, 0, :] = best_cost[0].astype(jnp.int32)
    out_ref[0, 1, :] = best_dx[0]
    out_ref[0, 2, :] = best_dy[0]
    out_ref[0, 3, :] = jnp.zeros((mbw,), jnp.int32)


@functools.partial(jax.jit, static_argnames=("rng", "mbh", "mbw",
                                             "interpret"))
def fullpel_search_pallas(cur_y: jnp.ndarray, ref_padded: jnp.ndarray,
                          rng: int, mbh: int, mbw: int, lam=1,
                          interpret: bool = False):
    """Exhaustive +-rng full-pel 16x16 SAD search (one grid step per MB
    row). MV cost = lambda*bits(se(4d)) against a zero predictor (the
    true per-MB predictor cost is applied in subpel refinement).
    Returns (mv [mbh,mbw,2] full-pel, cost [mbh,mbw])."""
    from ..ops.mc import PAD

    w = 16 * mbw
    span = 2 * rng
    wins = jnp.stack([
        jax.lax.dynamic_slice(
            ref_padded, (PAD - rng + 16 * r, PAD - rng),
            (16 + span, w + span))
        for r in range(mbh)])                     # [mbh, 16+2R, w+2R]
    # dynamic lane rotates require a 128-multiple lane dimension
    wpad = (-(w + span)) % 128
    if wpad:
        wins = jnp.pad(wins, ((0, 0), (0, 0), (0, wpad)))

    ssum = np.zeros((w, mbw), np.float32)
    for i in range(w):
        ssum[i, i // 16] = 1.0

    kern = functools.partial(_fullpel_kernel, rng=rng, mbw=mbw)
    lam_arr = jnp.asarray(lam, jnp.int32).reshape(1, 1)
    out = pl.pallas_call(
        kern,
        grid=(mbh,),
        in_specs=[
            pl.BlockSpec((16, w), lambda r: (r, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 16 + span, wins.shape[2]),
                         lambda r: (r, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((w, mbw), lambda r: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda r: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, 4, mbw), lambda r: (r, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((mbh, 4, mbw), jnp.int32),
        interpret=interpret,
    )(cur_y, wins, jnp.asarray(ssum), lam_arr)

    cost = out[:, 0]
    mv = jnp.stack([out[:, 1], out[:, 2]], axis=-1)
    return mv, cost
