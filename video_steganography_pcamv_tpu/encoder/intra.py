"""I-frame encoder: wavefront-batched i16x16 analysis + reconstruction.

The reference walks macroblocks serially (encoder/encoder.c:1240-2060),
each MB consuming its left/top neighbours' *reconstructed* pixels
(common/macroblock.c:914 cache_load). The TPU design schedules the MB
grid in anti-diagonal waves: every MB in wave d = mb_x + mb_y is
independent, so one `lax.fori_loop` step analyses, transforms and
reconstructs a whole wave as a batch (SURVEY.md §7 "wavefront
scheduling"). All wave membership tables are static, so the loop body
compiles once with fixed shapes; inactive lanes scatter out of bounds
and are dropped.

Per-MB pipeline (reference: x264_mb_analyse_intra analyse.c:628 +
x264_mb_encode_i16x16 encoder/macroblock.c:189-275 +
x264_mb_encode_8x8_chroma :277-385):
  gather borders -> predict 4 luma modes -> SATD argmin -> fDCT ->
  DC Hadamard + quant -> AC quant -> dequant/IDCT -> recon, and the
  same for chroma with a joint U+V mode decision.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..ops import transform as T
from ..ops import predict as P
from ..ops.transform import hadamard4x4, hadamard2x2
from ..ops.blocks import to_blocks


def wave_tables(mbw: int, mbh: int):
    """Static anti-diagonal wave membership: returns (mx, my, active)
    arrays of shape [n_waves, W] with W = min(mbw, mbh)."""
    n_waves = mbw + mbh - 1
    w = min(mbw, mbh)
    mx = np.zeros((n_waves, w), np.int32)
    my = np.zeros((n_waves, w), np.int32)
    act = np.zeros((n_waves, w), bool)
    for d in range(n_waves):
        xs = range(max(0, d - mbh + 1), min(d, mbw - 1) + 1)
        for lane, x in enumerate(xs):
            mx[d, lane] = x
            my[d, lane] = d - x
            act[d, lane] = True
    return mx, my, act


def _tile(img: jnp.ndarray, n: int) -> jnp.ndarray:
    """[H, W] -> [H/n, W/n, n, n] macroblock tiles."""
    h, w = img.shape
    return img.reshape(h // n, n, w // n, n).transpose(0, 2, 1, 3)


def _untile(t: jnp.ndarray) -> jnp.ndarray:
    mh, mw, n, _ = t.shape
    return t.transpose(0, 2, 1, 3).reshape(mh * n, mw * n)


def _luma_mb(enc, top, left, topleft, at, al, qp):
    """Batched i16x16 encode for one wave.

    enc: [W,16,16]; top/left: [W,16]; topleft, at, al: [W].
    Returns (mode, dc_lev [W,4,4], ac_lev [W,4,4,4,4], cbp_luma_flag,
    recon [W,16,16])."""
    preds = P.predict_i16x16_all(top, left, topleft, at, al)  # [W,4,16,16]
    d = to_blocks(enc[:, None] - preds, 4)            # [W,4m,4,4,4,4]
    satd = jnp.sum(jnp.abs(hadamard4x4(d)), axis=(-4, -3, -2, -1)) >> 1
    valid = jnp.stack([at, al, jnp.ones_like(at), at & al], axis=1)
    cost = jnp.where(valid, satd, jnp.int32(1 << 30))
    mode = jnp.argmin(cost, axis=1)                   # [W]
    pred = jnp.take_along_axis(
        preds, mode[:, None, None, None], axis=1)[:, 0]  # [W,16,16]

    res = to_blocks(enc - pred, 4)                    # [W,4,4,4,4]
    coef = T.dct4x4(res)
    dc = coef[:, 0, 0, :, :]                          # [W,4,4]
    dc_t = hadamard4x4(dc[..., None, None], final_shift=True)[..., 0, 0]
    dc_lev = T.quant_dc(dc_t, qp, intra=True)         # [W,4,4]
    ac = coef.at[:, 0, 0].set(0)
    ac_lev = T.quant4x4(ac, qp, intra=True)
    cbp_luma = jnp.any(ac_lev != 0, axis=(1, 2, 3, 4))  # [W]

    deq = T.dequant4x4(ac_lev, qp)
    dc_rec = hadamard4x4(dc_lev[..., None, None])[..., 0, 0]
    dc_rec = T.dequant_dc_luma(dc_rec, qp)            # [W,4,4]
    deq = deq.at[:, 0, 0].set(dc_rec)
    recon = T.idct4x4_add(to_blocks(pred, 4), deq)
    recon = recon.reshape(-1, 4, 4, 4, 4).transpose(0, 3, 1, 4, 2) \
                 .reshape(-1, 16, 16)
    return mode, dc_lev, ac_lev, cbp_luma, recon


def _chroma_mb(enc_u, enc_v, tops, lefts, topleft_u, topleft_v, at, al, qpc):
    """Batched chroma encode, joint U+V mode decision.

    enc_*: [W,8,8]; tops/lefts: ((top_u, top_v), (left_u, left_v)).
    Returns (mode, dc_lev [W,2,2,2], ac_lev [W,2,4,4,2,2], cbp_flags,
    recon_u, recon_v)."""
    (top_u, top_v), (left_u, left_v) = tops, lefts
    pu = P.predict_chroma_all(top_u, left_u, topleft_u, at, al)
    pv = P.predict_chroma_all(top_v, left_v, topleft_v, at, al)
    du = to_blocks(enc_u[:, None] - pu, 4)
    dv = to_blocks(enc_v[:, None] - pv, 4)
    satd = (jnp.sum(jnp.abs(hadamard4x4(du)), axis=(-4, -3, -2, -1))
            + jnp.sum(jnp.abs(hadamard4x4(dv)), axis=(-4, -3, -2, -1))) >> 1
    valid = jnp.stack([jnp.ones_like(at), al, at, at & al], axis=1)
    cost = jnp.where(valid, satd, jnp.int32(1 << 30))
    mode = jnp.argmin(cost, axis=1)

    def encode_plane(enc, preds):
        pred = jnp.take_along_axis(
            preds, mode[:, None, None, None], axis=1)[:, 0]  # [W,8,8]
        res = to_blocks(enc - pred, 4)                # [W,4,4,2,2]
        coef = T.dct4x4(res)
        dc = coef[:, 0, 0][..., None, None]           # [W,2(by),2(bx),1,1]
        dc_t = hadamard2x2(dc)
        dc_lev = T.quant_dc(dc_t[..., 0, 0], qpc, intra=True)  # [W,2,2]
        ac = coef.at[:, 0, 0].set(0)
        ac_lev = T.quant4x4(ac, qpc, intra=True)
        # recon
        deq = T.dequant4x4(ac_lev, qpc)
        dc_rec = hadamard2x2(dc_lev[..., None, None])[..., 0, 0]  # [W,2,2]
        dc_rec = T.dequant_dc_chroma(dc_rec, qpc)
        deq = deq.at[:, 0, 0].set(dc_rec)
        recon = T.idct4x4_add(to_blocks(pred, 4), deq)
        recon = recon.reshape(-1, 4, 4, 2, 2).transpose(0, 3, 1, 4, 2) \
                     .reshape(-1, 8, 8)
        return dc_lev, ac_lev, recon

    dcu, acu, ru = encode_plane(enc_u, pu)
    dcv, acv, rv = encode_plane(enc_v, pv)
    dc_lev = jnp.stack([dcu, dcv], axis=1)            # [W,2(uv),2,2]
    ac_lev = jnp.stack([acu, acv], axis=1)            # [W,2(uv),4,4,2,2]
    ac_nz = jnp.any(ac_lev != 0, axis=(1, 2, 3, 4, 5))
    dc_nz = jnp.any(dc_lev != 0, axis=(1, 2, 3))
    cbp_chroma = jnp.where(ac_nz, 2, jnp.where(dc_nz, 1, 0))
    return mode, dc_lev, ac_lev, cbp_chroma, ru, rv


@functools.partial(jax.jit, static_argnames=("qp", "qpc", "mbw", "mbh"))
def encode_i_frame(y, u, v, qp: int, qpc: int, mbw: int, mbh: int):
    """Encode one I-frame. y: [16*mbh, 16*mbw] int32; u, v: half size.
    qp/qpc static (CQP; quant tables fold into the compiled program).

    Returns dict of per-MB decision/level arrays + recon planes.
    """
    mx_t, my_t, act_t = wave_tables(mbw, mbh)
    n_waves, W = mx_t.shape
    mx_t, my_t = jnp.asarray(mx_t), jnp.asarray(my_t)
    act_t = jnp.asarray(act_t)

    ty = _tile(y, 16)       # [mbh, mbw, 16, 16]
    tu = _tile(u, 8)
    tv = _tile(v, 8)

    state = dict(
        ry=jnp.zeros((mbh, mbw, 16, 16), jnp.int32),
        ru=jnp.zeros((mbh, mbw, 8, 8), jnp.int32),
        rv=jnp.zeros((mbh, mbw, 8, 8), jnp.int32),
        mode=jnp.zeros((mbh, mbw), jnp.int32),
        cmode=jnp.zeros((mbh, mbw), jnp.int32),
        cbp_luma=jnp.zeros((mbh, mbw), jnp.int32),
        cbp_chroma=jnp.zeros((mbh, mbw), jnp.int32),
        luma_dc=jnp.zeros((mbh, mbw, 4, 4), jnp.int32),
        luma_ac=jnp.zeros((mbh, mbw, 4, 4, 4, 4), jnp.int32),
        chroma_dc=jnp.zeros((mbh, mbw, 2, 2, 2), jnp.int32),
        chroma_ac=jnp.zeros((mbh, mbw, 2, 2, 2, 4, 4), jnp.int32),
    )

    def body(d, st):
        mx = jax.lax.dynamic_slice(mx_t, (d, 0), (1, W))[0]
        my = jax.lax.dynamic_slice(my_t, (d, 0), (1, W))[0]
        act = jax.lax.dynamic_slice(act_t, (d, 0), (1, W))[0]
        at = act & (my > 0)
        al = act & (mx > 0)
        mxc = jnp.maximum(mx - 1, 0)
        myc = jnp.maximum(my - 1, 0)

        enc = ty[my, mx]                                  # [W,16,16]
        top = st["ry"][myc, mx, 15, :]
        left = st["ry"][my, mxc, :, 15]
        tl = st["ry"][myc, mxc, 15, 15]
        mode, dc_lev, ac_lev, cbpl, rec = _luma_mb(
            enc, top, left, tl, at, al, qp)

        cu, cvv = tu[my, mx], tv[my, mx]
        top_u = st["ru"][myc, mx, 7, :]
        top_v = st["rv"][myc, mx, 7, :]
        left_u = st["ru"][my, mxc, :, 7]
        left_v = st["rv"][my, mxc, :, 7]
        tlu = st["ru"][myc, mxc, 7, 7]
        tlv = st["rv"][myc, mxc, 7, 7]
        cmode, cdc, cac, cbpc, ruu, rvv = _chroma_mb(
            cu, cvv, (top_u, top_v), (left_u, left_v), tlu, tlv, at, al, qpc)

        # inactive lanes scatter out of bounds -> dropped
        sy = jnp.where(act, my, mbh)
        sx = jnp.where(act, mx, mbw)
        st = dict(st)
        st["ry"] = st["ry"].at[sy, sx].set(rec, mode="drop")
        st["ru"] = st["ru"].at[sy, sx].set(ruu, mode="drop")
        st["rv"] = st["rv"].at[sy, sx].set(rvv, mode="drop")
        st["mode"] = st["mode"].at[sy, sx].set(mode, mode="drop")
        st["cmode"] = st["cmode"].at[sy, sx].set(cmode, mode="drop")
        st["cbp_luma"] = st["cbp_luma"].at[sy, sx].set(
            cbpl.astype(jnp.int32) * 15, mode="drop")
        st["cbp_chroma"] = st["cbp_chroma"].at[sy, sx].set(cbpc, mode="drop")
        st["luma_dc"] = st["luma_dc"].at[sy, sx].set(dc_lev, mode="drop")
        st["luma_ac"] = st["luma_ac"].at[sy, sx].set(
            jnp.moveaxis(ac_lev, (1, 2), (3, 4)), mode="drop")
        st["chroma_dc"] = st["chroma_dc"].at[sy, sx].set(cdc, mode="drop")
        st["chroma_ac"] = st["chroma_ac"].at[sy, sx].set(
            jnp.moveaxis(cac, (2, 3), (4, 5)), mode="drop")
        return st

    state = jax.lax.fori_loop(0, n_waves, body, state)
    out = dict(state)
    out["recon_y"] = _untile(state.pop("ry"))
    out["recon_u"] = _untile(state.pop("ru"))
    out["recon_v"] = _untile(state.pop("rv"))
    for k in ("ry", "ru", "rv"):
        out.pop(k, None)
    return out
