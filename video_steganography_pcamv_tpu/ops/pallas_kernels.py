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
            # matmul on raw |d| (<= 255, exact in the MXU's bf16 passes)
            # then row-sum in f32: exact SADs at DEFAULT precision —
            # pre-summing rows first exceeds bf16's mantissa and rounds
            sad = jnp.sum(jnp.dot(d, s,
                                  preferred_element_type=jnp.float32),
                          axis=0, keepdims=True)             # [1, mbw]
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


def _dct_quant_kernel(cur_ref, pred_ref, mf_ref, bias_ref, out_ref, *,
                      zero_dc: bool):
    """Fused residual DCT + quant over [16(coef), L(blocks)] tiles.
    Row i = coefficient position (4*r + c); mf/bias: SMEM [16] per-qp
    constants. Replaces the XLA chain in luma_p_encode (VPU-bound, one
    VMEM pass instead of ~30 HBM passes)."""
    x = cur_ref[...] - pred_ref[...]
    rows = [x[i:i + 1, :] for i in range(16)]
    tmp = [None] * 16
    for r in range(4):
        x0, x1, x2, x3 = rows[4 * r:4 * r + 4]
        s03, s12 = x0 + x3, x1 + x2
        d03, d12 = x0 - x3, x1 - x2
        tmp[4 * r + 0] = s03 + s12
        tmp[4 * r + 1] = 2 * d03 + d12
        tmp[4 * r + 2] = s03 - s12
        tmp[4 * r + 3] = d03 - 2 * d12
    coef = [None] * 16
    for c in range(4):
        x0, x1, x2, x3 = tmp[c], tmp[4 + c], tmp[8 + c], tmp[12 + c]
        s03, s12 = x0 + x3, x1 + x2
        d03, d12 = x0 - x3, x1 - x2
        coef[c] = s03 + s12
        coef[4 + c] = 2 * d03 + d12
        coef[8 + c] = s03 - s12
        coef[12 + c] = d03 - 2 * d12
    for i in range(16):
        if zero_dc and i == 0:
            out_ref[0:1, :] = jnp.zeros_like(coef[0])
            continue
        cc = coef[i]
        mag = (bias_ref[i] + jnp.abs(cc)) * mf_ref[i] >> 16
        out_ref[i:i + 1, :] = jnp.sign(cc) * mag


def _deq_idct_kernel(lev_ref, pred_ref, dc_ref, dmf_ref, qb_ref,
                     out_ref, *, use_dc: bool):
    """Fused dequant + inverse transform + reconstruction over
    [16, L] tiles. dc_ref: [1, L] pre-dequantized DC replacing row 0
    (chroma path); qb_ref: SMEM [1] qbits = qp//6 - 4."""
    lv = lev_ref[...]
    qb = qb_ref[0]
    shl = jnp.maximum(qb, 0)
    shr = jnp.maximum(-qb, 0)
    f = jnp.where(qb < 0, 1 << jnp.maximum(-qb - 1, 0), 0)
    deq = []
    for i in range(16):
        d = (lv[i:i + 1, :] * dmf_ref[i])
        d = jnp.where(qb >= 0, d << shl, (d + f) >> shr)
        deq.append(d)
    if use_dc:
        deq[0] = dc_ref[...]
    tmp = [None] * 16
    for r in range(4):
        x0, x1, x2, x3 = deq[4 * r:4 * r + 4]
        s02, d02 = x0 + x2, x0 - x2
        s13 = x1 + (x3 >> 1)
        d13 = (x1 >> 1) - x3
        tmp[4 * r + 0] = s02 + s13
        tmp[4 * r + 1] = d02 + d13
        tmp[4 * r + 2] = d02 - d13
        tmp[4 * r + 3] = s02 - s13
    pred = pred_ref[...]
    for c in range(4):
        x0, x1, x2, x3 = tmp[c], tmp[4 + c], tmp[8 + c], tmp[12 + c]
        s02, d02 = x0 + x2, x0 - x2
        s13 = x1 + (x3 >> 1)
        d13 = (x1 >> 1) - x3
        for i, val in ((c, s02 + s13), (4 + c, d02 + d13),
                       (8 + c, d02 - d13), (12 + c, s02 - s13)):
            r = (val + 32) >> 6
            out_ref[i:i + 1, :] = jnp.clip(
                pred[i:i + 1, :] + r, 0, 255)


_TQ_CHUNK = 2048


def _pad_lanes(a, ch):
    L = a.shape[1]
    padl = (-L) % ch
    if padl:
        a = jnp.pad(a, ((0, 0), (0, padl)))
    return a


@functools.partial(jax.jit, static_argnames=("zero_dc", "interpret"))
def dct_quant_pallas(cur16, pred16, mf16, bias16, zero_dc=False,
                     interpret=False):
    """cur16/pred16: [16, L]; mf16/bias16: [16] int32 per-coef quant
    constants (already qp-resolved). Returns lev [16, L]."""
    interpret = interpret or jax.default_backend() != "tpu"
    L = cur16.shape[1]
    cur_p = _pad_lanes(cur16, _TQ_CHUNK)
    pred_p = _pad_lanes(pred16, _TQ_CHUNK)
    g = cur_p.shape[1] // _TQ_CHUNK
    out = pl.pallas_call(
        functools.partial(_dct_quant_kernel, zero_dc=zero_dc),
        grid=(g,),
        in_specs=[
            pl.BlockSpec((16, _TQ_CHUNK), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((16, _TQ_CHUNK), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((16, _TQ_CHUNK), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(cur_p.shape, jnp.int32),
        interpret=interpret,
    )(cur_p, pred_p, mf16, bias16)
    return out[:, :L]


@functools.partial(jax.jit, static_argnames=("use_dc", "interpret"))
def deq_idct_pallas(lev16, pred16, dmf16, qbits, dc=None, use_dc=False,
                    interpret=False):
    """lev16/pred16: [16, L]; dmf16: [16]; qbits: scalar (qp//6-4);
    dc: [1, L] dequantized DC for row 0 (chroma). Returns recon [16, L]."""
    interpret = interpret or jax.default_backend() != "tpu"
    L = lev16.shape[1]
    lev_p = _pad_lanes(lev16, _TQ_CHUNK)
    pred_p = _pad_lanes(pred16, _TQ_CHUNK)
    if dc is None:
        dc = jnp.zeros((1, lev_p.shape[1]), jnp.int32)
    else:
        dc = _pad_lanes(dc, _TQ_CHUNK)
    g = lev_p.shape[1] // _TQ_CHUNK
    qb = jnp.asarray(qbits, jnp.int32).reshape(1)
    out = pl.pallas_call(
        functools.partial(_deq_idct_kernel, use_dc=use_dc),
        grid=(g,),
        in_specs=[
            pl.BlockSpec((16, _TQ_CHUNK), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((16, _TQ_CHUNK), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _TQ_CHUNK), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((16, _TQ_CHUNK), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(lev_p.shape, jnp.int32),
        interpret=interpret,
    )(lev_p, pred_p, dc, dmf16, qb)
    return out[:, :L]


def _window8_kernel(b_ref, yr_ref, xs_ref, banks_ref, out_ref, sem):
    """Per-8x8-block window DMA from the 8-bank vertically-shifted
    plane copies: dynamic sublane starts become 8-aligned (the Mosaic
    DMA rule the naive gather kernel trips over; see docs/PERF.md).

    STATUS: compiles + matches the XLA twin in interpret mode, but the
    real Mosaic backend additionally requires DMA lane-slice WIDTHS to
    be 128-multiples ("Slice shape along dimension 3 must be aligned to
    tiling (128)") and a window is 16 wide. Kept off the default path;
    the fix is a wider batched fetch shape (e.g. 8 windows per DMA)."""
    i = pl.program_id(0)
    yr = pl.multiple_of(yr_ref[i], 8)   # 8-aligned by construction
    cp = pltpu.make_async_copy(
        banks_ref.at[b_ref[i], :, pl.ds(yr, 16), pl.ds(xs_ref[i], 16)],
        out_ref.at[0], sem)
    cp.start()
    cp.wait()


@functools.partial(jax.jit, static_argnames=("mbh", "mbw", "interpret"))
def gather_windows8_banked(planes: jnp.ndarray, mvfp8: jnp.ndarray,
                           mbh: int, mbw: int, interpret: bool = False):
    """[4, Hp, Wp] planes + [2mbh, 2mbw, 2] full-pel MVs ->
    [N8, 4, 16, 16] per-8x8-block qpel windows (banked DMA; twin of
    encoder/partition.py gather_windows8_jnp)."""
    from ..ops.mc import PAD
    MARGIN = 4
    # bank b row y = plane row y + b; +8 bottom pad keeps the deepest
    # bank in range for maximal MVs
    padded = jnp.pad(planes, ((0, 0), (0, 8), (0, 0)), mode="edge")
    Hp = planes.shape[1]
    banks = jnp.stack([padded[:, b:b + Hp, :] for b in range(8)])

    n8 = 4 * mbh * mbw
    bys = (jnp.arange(n8) // (2 * mbw)) * 8
    bxs = (jnp.arange(n8) % (2 * mbw)) * 8
    mvf = mvfp8.reshape(n8, 2)
    ys = (bys + PAD - MARGIN + mvf[:, 1]).astype(jnp.int32)
    xs = (bxs + PAD - MARGIN + mvf[:, 0]).astype(jnp.int32)
    b = ys % 8
    yr = ys - b

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n8,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((1, 4, 16, 16),
                               lambda i, b, yr, xs: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.SemaphoreType.DMA],
    )
    return pl.pallas_call(
        _window8_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n8, 4, 16, 16), planes.dtype),
        interpret=interpret,
    )(b, yr, xs, banks)


def _fullpel_parts_kernel(cur_ref, win_ref, se_ref, so_ref, lam_ref,
                          out_ref, *, rng: int, mbw: int):
    """Per-MB-row exhaustive scan producing best (cost, mv) for all 9
    partition units of every MB: unit order [16x16, 16x8T, 16x8B,
    8x16L, 8x16R, 8x8TL, 8x8TR, 8x8BL, 8x8BR]. MV packed as
    (dx+64) | ((dy+64)<<8)."""
    cur = cur_ref[...].astype(jnp.float32)          # [16, w]
    se = se_ref[...]                                 # [w, mbw] even 8-col
    so = so_ref[...]                                 # [w, mbw] odd 8-col
    lam = lam_ref[0, 0]
    w = cur.shape[1]
    span = 2 * rng + 1
    big = jnp.full((1, mbw), 1e30, jnp.float32)
    zed = jnp.zeros((1, mbw), jnp.int32)
    carry = tuple([big] * 9 + [zed] * 9)

    cur_t = cur[0:8, :]
    cur_b = cur[8:16, :]

    for dy in range(span):
        strip = win_ref[0, dy:dy + 16, :].astype(jnp.float32)
        mvc_y = lam * _se_bits(jnp.int32(4 * (dy - rng)))

        def body(dx, c, strip=strip, mvc_y=mvc_y, dy=dy):
            costs = list(c[:9])
            mvs = list(c[9:])
            rolled = pltpu.roll(strip, -dx, axis=1)[:, :w]
            dt = jnp.abs(cur_t - rolled[0:8, :])
            db = jnp.abs(cur_b - rolled[8:16, :])
            # raw |d| (<= 255) through the MXU, rows summed after: exact
            # at default precision (pre-summed rows overflow bf16)
            dot = lambda a, s: jnp.sum(
                jnp.dot(a, s, preferred_element_type=jnp.float32),
                axis=0, keepdims=True)
            q00 = dot(dt, se)
            q01 = dot(dt, so)
            q10 = dot(db, se)
            q11 = dot(db, so)
            mvc = (mvc_y + lam * _se_bits(4 * (dx - rng))) \
                .astype(jnp.float32)
            unit = [q00 + q01 + q10 + q11,               # 16x16
                    q00 + q01, q10 + q11,                # 16x8 T/B
                    q00 + q10, q01 + q11,                # 8x16 L/R
                    q00, q01, q10, q11]                  # 8x8 quads
            packed = (dx - rng + 64) | ((dy - rng + 64) << 8)
            for u in range(9):
                cost = unit[u] + mvc
                better = cost < costs[u]
                costs[u] = jnp.where(better, cost, costs[u])
                mvs[u] = jnp.where(better, packed, mvs[u])
            return tuple(costs + mvs)

        carry = jax.lax.fori_loop(0, span, body, carry)

    for u in range(9):
        out_ref[0, 2 * u, :] = carry[u][0].astype(jnp.int32)
        out_ref[0, 2 * u + 1, :] = carry[9 + u][0]


def _fullpel_parts_kernel2(cur_ref, win_ref, s2_ref, red_ref, lam_ref,
                           out_ref, *, rng: int, mbw: int):
    """dx-grouped rewrite of _fullpel_parts_kernel: 8 displacements'
    |d| stacked to [128, w] feed ONE bf16 MXU dot against the combined
    even|odd column-group matrix (the M=8 dots of v1 left 15/16 of the
    systolic array idle — measured ~45 ms/frame at 1080p, ~8x off the
    matmul roofline).  Row-group sums then ride a small
    highest-precision f32 dot (values <= 2040 > bf16's exact-int
    range).  Bit-identical unit costs/argmins; same output format."""
    cur = cur_ref[...].astype(jnp.float32)          # [16, w]
    s2 = s2_ref[...]                                 # [w, 2*mbw] bf16
    red = red_ref[...]                               # [16, 128] f32
    lam = lam_ref[0, 0]
    w = cur.shape[1]
    span = 2 * rng + 1
    w_all = win_ref[0].astype(jnp.float32)           # [16+2rng, wp]
    hs = w_all.shape[0]
    wp = w_all.shape[1]
    big = jnp.full((1, mbw), 1e30, jnp.float32)
    zed = jnp.zeros((1, mbw), jnp.int32)
    carry = tuple([big] * 9 + [zed] * 9)

    # both sweeps are fori_loops (an unrolled dy sweep held 33 live
    # [128, w] stacks and blew the 16 MB scoped-vmem budget); the
    # traced-dy strip comes from a dynamic sublane rotate
    def dy_body(dy, cdy):
        strip = pltpu.roll(w_all, (-dy) % hs, axis=0)[0:16, :]
        mvc_y = lam * _se_bits(4 * (dy - rng))

        def body(gi, c):
            costs = list(c[:9])
            mvs = list(c[9:])
            dxg = gi * 8
            parts = []
            for j in range(8):
                rolled = pltpu.roll(strip, (-(dxg + j)) % wp, axis=1)
                parts.append(
                    jnp.abs(cur - rolled[:, :w]).astype(jnp.bfloat16))
            T = jnp.concatenate(parts, axis=0)       # [128, w] |d|<=255
            P = jnp.dot(T, s2, preferred_element_type=jnp.float32)
            # row-group sums (<= 2040: exact only at f32 precision)
            Q = jax.lax.dot(red, P,
                            precision=jax.lax.Precision.HIGHEST)
            for j in range(8):
                dx = dxg + j
                q00 = Q[2 * j:2 * j + 1, :mbw]
                q10 = Q[2 * j + 1:2 * j + 2, :mbw]
                q01 = Q[2 * j:2 * j + 1, mbw:]
                q11 = Q[2 * j + 1:2 * j + 2, mbw:]
                mvc = (mvc_y + lam * _se_bits(dx * 4 - 4 * rng)) \
                    .astype(jnp.float32)
                # displacements beyond the span exist only as group
                # padding: mask them out of the argmin
                mvc = mvc + jnp.where(dx >= span,
                                      jnp.float32(1e30), 0.0)
                unit = [q00 + q01 + q10 + q11,
                        q00 + q01, q10 + q11,
                        q00 + q10, q01 + q11,
                        q00, q01, q10, q11]
                packed = (dx - rng + 64) | ((dy - rng + 64) << 8)
                for u in range(9):
                    cost = unit[u] + mvc
                    better = cost < costs[u]
                    costs[u] = jnp.where(better, cost, costs[u])
                    mvs[u] = jnp.where(better, packed, mvs[u])
            return tuple(costs + mvs)

        return jax.lax.fori_loop(0, (span + 7) // 8, body, cdy)

    carry = jax.lax.fori_loop(0, span, dy_body, carry)

    for u in range(9):
        out_ref[0, 2 * u, :] = carry[u][0].astype(jnp.int32)
        out_ref[0, 2 * u + 1, :] = carry[9 + u][0]


@functools.partial(jax.jit, static_argnames=("rng", "mbh", "mbw",
                                             "interpret", "grouped"))
def fullpel_parts_pallas(cur_y: jnp.ndarray, ref_padded: jnp.ndarray,
                         rng: int, mbh: int, mbw: int, lam=1,
                         interpret: bool = False, grouped: bool = True):
    """Partition-unit exhaustive full-pel search (Pallas twin of
    encoder/partition.py fullpel_search_parts with a zero MV predictor).
    Returns the same st dict: c16/mv16, c16x8/mv16x8, c8x16/mv8x16,
    c8/mv8 (full-pel MVs)."""
    from ..ops.mc import PAD

    w = 16 * mbw
    span = 2 * rng
    wins = jnp.stack([
        jax.lax.dynamic_slice(
            ref_padded, (PAD - rng + 16 * r, PAD - rng),
            (16 + span, w + span))
        for r in range(mbh)])
    wpad = (-(w + span)) % 128
    if wpad:
        wins = jnp.pad(wins, ((0, 0), (0, 0), (0, wpad)))

    s_e = np.zeros((w, mbw), np.float32)
    s_o = np.zeros((w, mbw), np.float32)
    for i in range(w):
        if (i % 16) < 8:
            s_e[i, i // 16] = 1.0
        else:
            s_o[i, i // 16] = 1.0

    lam_arr = jnp.asarray(lam, jnp.int32).reshape(1, 1)
    if grouped and not interpret:
        red = np.zeros((16, 128), np.float32)
        for j in range(8):
            for h in range(2):
                red[2 * j + h, 16 * j + 8 * h:16 * j + 8 * h + 8] = 1.0
        kern = functools.partial(_fullpel_parts_kernel2, rng=rng,
                                 mbw=mbw)
        out = pl.pallas_call(
            kern,
            grid=(mbh,),
            in_specs=[
                pl.BlockSpec((16, w), lambda r: (r, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 16 + span, wins.shape[2]),
                             lambda r: (r, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((w, 2 * mbw), lambda r: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((16, 128), lambda r: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1), lambda r: (0, 0),
                             memory_space=pltpu.SMEM),
            ],
            out_specs=pl.BlockSpec((1, 18, mbw), lambda r: (r, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((mbh, 18, mbw), jnp.int32),
            interpret=interpret,
        )(cur_y, wins,
          jnp.asarray(np.concatenate([s_e, s_o], 1), jnp.bfloat16),
          jnp.asarray(red), lam_arr)
    else:
        kern = functools.partial(_fullpel_parts_kernel, rng=rng,
                                 mbw=mbw)
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
                pl.BlockSpec((w, mbw), lambda r: (0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 1), lambda r: (0, 0),
                             memory_space=pltpu.SMEM),
            ],
            out_specs=pl.BlockSpec((1, 18, mbw), lambda r: (r, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((mbh, 18, mbw), jnp.int32),
            interpret=interpret,
        )(cur_y, wins, jnp.asarray(s_e), jnp.asarray(s_o), lam_arr)

    def unpack(u):
        cost = out[:, 2 * u]                       # [mbh, mbw]
        pk = out[:, 2 * u + 1]
        mv = jnp.stack([(pk & 0xFF) - 64, (pk >> 8) - 64], axis=-1)
        return cost, mv

    c16, mv16 = unpack(0)
    ct, mvt = unpack(1)
    cb, mvb = unpack(2)
    cl, mvl = unpack(3)
    cr, mvr = unpack(4)
    c8 = []
    mv8 = []
    for u in range(5, 9):
        cc, mm = unpack(u)
        c8.append(cc)
        mv8.append(mm)
    return dict(
        c16=c16, mv16=mv16,
        c16x8=jnp.stack([ct, cb], axis=-1),
        mv16x8=jnp.stack([mvt, mvb], axis=-2),
        c8x16=jnp.stack([cl, cr], axis=-1),
        mv8x16=jnp.stack([mvl, mvr], axis=-2),
        c8=jnp.stack(c8, axis=-1),
        mv8=jnp.stack(mv8, axis=-2),
    )


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
