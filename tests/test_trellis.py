"""Trellis quantization: NumPy-oracle DP equivalence + RD end-to-end.

Oracle: a direct serial port of the reference DP semantics
(encoder/rdo.c:411-648 quant_trellis_cabac) written independently of
the batched lax.scan implementation in ops/trellis.py.
"""

import numpy as np
import pytest

from video_steganography_pcamv_tpu.ops.trellis import (
    trellis_quant, CAT_LUMA_4x4, CAT_CHROMA_AC, _entropy_tables,
    _unary_tables, _ctx_state_tables, _mf_unq_zig, _weight2_zig,
    _lambda2_tab, _LEVEL1_CTX, _LEVELGT1_CTX, _LEVEL_TRANS)

import jax.numpy as jnp

W, H = 96, 64


def oracle_trellis(zz, qp, cat, intra):
    """Serial reference DP (one block)."""
    ent, trans = _entropy_tables()
    ucost, utrans = _unary_tables()
    sig_t, last_t, abs_t = _ctx_state_tables()
    mf_t, unq_t = _mf_unq_zig()
    li = 0 if intra else 1
    lam2 = _lambda2_tab()[1 if intra else 0, qp]
    n = len(zz)
    off = 1 if cat in (1, 4) else 0
    mf = mf_t[li, qp][off:off + n].astype(np.int64)
    unq = unq_t[li, qp][off:off + n].astype(np.int64)
    w = _weight2_zig()[off:off + n]
    sig_st = sig_t[qp, cat]
    last_st = last_t[qp, cat]
    INF = float("inf")

    a = np.abs(zz).astype(np.int64)
    sgn = np.sign(zz)
    q = (a * mf + (1 << 15)) >> 16
    nzpos = np.nonzero(q > 0)[0]
    if len(nzpos) == 0:
        return np.zeros(n, np.int64)
    lastnz = nzpos[-1]

    # node: (score, states[10], levels list)
    nodes = [None] * 8
    nodes[0] = (0.0, abs_t[qp, cat].copy(), [])
    nctx = 2 if cat == 3 else 14

    for i in range(lastnz, -1, -1):
        cost_sig = [0, 0] if i == n - 1 else \
            [ent[sig_st[min(i, nctx)], 0], ent[sig_st[min(i, nctx)], 1]]
        cost_last = [0, 0] if i == n - 1 else \
            [ent[last_st[min(i, nctx)], 0], ent[last_st[min(i, nctx)], 1]]
        if q[i] == 0:
            for j in range(1, 8):
                if nodes[j] is not None:
                    s, st, lv = nodes[j]
                    nodes[j] = (s + cost_sig[0] * lam2 / 16.0, st,
                                [0] + lv)
            if nodes[0] is not None:
                s, st, lv = nodes[0]
                nodes[0] = (s, st, [0] + lv)
            continue
        new = [None] * 8
        for lev in (q[i], max(q[i] - 1, 0)):
            unq_l = float((lev * unq[i] + 128) >> 8)
            d = float(a[i]) - unq_l
            ssd = d * d * w[i]
            for j in range(8):
                if nodes[j] is None:
                    continue
                s, st, lv = nodes[j]
                st = st.copy()
                bits = 0
                if lev == 0:
                    nc = j
                    if j > 0:
                        bits = cost_sig[0]
                else:
                    bits = cost_sig[1] + cost_last[1 if j == 0 else 0]
                    prefix = min(lev - 1, 14)
                    c1 = _LEVEL1_CTX[j]
                    bits += ent[st[c1], 1 if prefix > 0 else 0]
                    st[c1] = trans[st[c1], 1 if prefix > 0 else 0]
                    if prefix > 0:
                        cg = _LEVELGT1_CTX[j]
                        bits += ucost[prefix, st[cg]]
                        st[cg] = utrans[prefix, st[cg]]
                        if lev >= 15:
                            v = lev - 15
                            nb = (int(v) + 1).bit_length()
                            bits += (2 * nb - 1) << 8
                    else:
                        bits += 1 << 8
                    nc = _LEVEL_TRANS[1 if lev > 1 else 0][j]
                score = s + ssd + bits * lam2 / 16.0
                if new[nc] is None or score < new[nc][0]:
                    new[nc] = (score, st, [int(lev)] + lv)
        nodes = new
    best = min((nd for nd in nodes if nd is not None),
               key=lambda t: t[0])
    levels = best[2]
    out = np.zeros(n, np.int64)
    for i, l in enumerate(levels):
        out[i] = l * sgn[i]
    return out


@pytest.mark.parametrize("qp", [20, 28, 38])
def test_trellis_matches_oracle(qp):
    rng = np.random.RandomState(qp)
    M = 48
    zz = (rng.randn(M, 16) * (300 / (1 + np.arange(16)))
          * (rng.rand(M, 16) > 0.3)).astype(np.int32)
    got = np.asarray(trellis_quant(jnp.asarray(zz), qp,
                                   CAT_LUMA_4x4, False))
    for m in range(M):
        exp = oracle_trellis(zz[m], qp, CAT_LUMA_4x4, False)
        np.testing.assert_array_equal(
            got[m], exp, err_msg=f"block {m}: {zz[m]}")


def test_trellis_ac_cat():
    rng = np.random.RandomState(7)
    M = 16
    zz = (rng.randn(M, 15) * 150 * (rng.rand(M, 15) > 0.5)) \
        .astype(np.int32)
    got = np.asarray(trellis_quant(jnp.asarray(zz), 30,
                                   CAT_CHROMA_AC, False))
    for m in range(M):
        exp = oracle_trellis(zz[m], 30, CAT_CHROMA_AC, False)
        np.testing.assert_array_equal(got[m], exp)


def test_trellis_e2e_rd():
    """End-to-end: --trellis 1 must stay decodable (bit-exact recon)
    and improve the bits side of the RD tradeoff."""
    from video_steganography_pcamv_tpu.params import Params
    from video_steganography_pcamv_tpu.utils.yuv import Frame
    from video_steganography_pcamv_tpu.encoder.core import Encoder
    from video_steganography_pcamv_tpu.decoder import decode_annexb

    rng = np.random.RandomState(3)
    pad = 20
    a = rng.randint(0, 256, (H + 2 * pad, W + 2 * pad)).astype(np.uint8)
    for _ in range(2):
        a = ((a.astype(np.int32) + np.roll(a, 1, 0) + np.roll(a, 1, 1)
              + np.roll(np.roll(a, 1, 0), 1, 1)) // 4).astype(np.uint8)
    u = np.full((H // 2, W // 2), 128, np.uint8)
    frames = []
    for i in range(4):
        noise = (rng.randn(H, W) * 6).astype(np.int32)
        yp = np.clip(a[pad + i:pad + i + H, pad + 2 * i:pad + 2 * i + W]
                     .astype(np.int32) + noise, 0, 255).astype(np.uint8)
        frames.append(Frame(yp, u.copy(), u.copy()))

    out = {}
    for tre in (0, 1):
        p = Params(width=W, height=H, qp=30, me_range=4, trellis=tre,
                   cabac=True)
        enc = Encoder(p)
        bs = b""
        for f in frames:
            bs += enc.encode_frame(f)
        dec = decode_annexb(bs)
        ry = np.asarray(enc.recon_prev[0])[:H, :W].astype(np.uint8)
        np.testing.assert_array_equal(dec[-1].y, ry,
                                      err_msg=f"trellis={tre} recon")
        mse = np.mean((ry.astype(np.int64)
                       - frames[-1].y.astype(np.int64)) ** 2)
        out[tre] = (len(bs), mse)
    bits0, mse0 = out[0]
    bits1, mse1 = out[1]
    # trellis trades a bounded distortion increase for fewer bits
    assert bits1 < bits0, out
    assert mse1 < mse0 * 1.35, out


def test_trellis_per_block_qp_matches_scalar():
    """Per-block qp [M] must reproduce per-row scalar-qp calls exactly
    (the AQ path gathers lambda2/quantizer/ctx tables per row)."""
    rng = np.random.RandomState(11)
    m, n = 12, 16
    zz = (rng.randn(m, n) * 40).astype(np.int32)
    qps = rng.randint(18, 40, m).astype(np.int32)
    batched = np.asarray(trellis_quant(jnp.asarray(zz),
                                       jnp.asarray(qps),
                                       CAT_LUMA_4x4, False))
    for i in range(m):
        one = np.asarray(trellis_quant(jnp.asarray(zz[i:i + 1]),
                                       jnp.asarray(int(qps[i])),
                                       CAT_LUMA_4x4, False))
        np.testing.assert_array_equal(batched[i], one[0],
                                      err_msg=f"row {i} qp {qps[i]}")
