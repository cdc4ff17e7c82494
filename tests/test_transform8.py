"""8x8 transform family vs a direct scalar port of the reference
macros (dct.c:236-330 DCT8_1D/IDCT8_1D, quant.c:42/111, set.c cqm
construction) — the checkasm pattern (kernel vs C oracle on random
buffers)."""

import numpy as np
import jax.numpy as jnp

from video_steganography_pcamv_tpu.ops import transform8 as T8

rng = np.random.RandomState(5)


def oracle_dct8(res):
    """Scalar transcription of DCT8_1D row/col passes."""
    tmp = res.astype(np.int64).copy()

    def pass1d(get, put):
        s = [get(x) for x in range(8)]
        s07, s16, s25, s34 = s[0]+s[7], s[1]+s[6], s[2]+s[5], s[3]+s[4]
        a0, a1, a2, a3 = s07+s34, s16+s25, s07-s34, s16-s25
        d07, d16, d25, d34 = s[0]-s[7], s[1]-s[6], s[2]-s[5], s[3]-s[4]
        a4 = d16 + d25 + (d07 + (d07 >> 1))
        a5 = d07 - d34 - (d25 + (d25 >> 1))
        a6 = d07 + d34 - (d16 + (d16 >> 1))
        a7 = d16 - d25 + (d34 + (d34 >> 1))
        put(0, a0 + a1)
        put(1, a4 + (a7 >> 2))
        put(2, a2 + (a3 >> 1))
        put(3, a5 + (a6 >> 2))
        put(4, a0 - a1)
        put(5, a6 - (a5 >> 2))
        put(6, (a2 >> 1) - a3)
        put(7, (a4 >> 2) - a7)

    for i in range(8):       # SRC(x)=tmp[x][i], DST(x)=tmp[x][i]
        pass1d(lambda x: tmp[x][i],
               lambda x, v: tmp.__setitem__((x, i), v))
    out = np.zeros((8, 8), np.int64)
    for i in range(8):       # SRC(x)=tmp[i][x], DST(x)=dct[x][i]
        pass1d(lambda x: tmp[i][x],
               lambda x, v: out.__setitem__((x, i), v))
    return out


def oracle_idct8_add(pred, coef):
    dct = coef.astype(np.int64).copy()
    dct[0][0] += 32

    def pass1d(get, put):
        s = [get(x) for x in range(8)]
        a0, a2 = s[0] + s[4], s[0] - s[4]
        a4, a6 = (s[2] >> 1) - s[6], (s[6] >> 1) + s[2]
        b0, b2, b4, b6 = a0 + a6, a2 + a4, a2 - a4, a0 - a6
        a1 = -s[3] + s[5] - s[7] - (s[7] >> 1)
        a3 = s[1] + s[7] - s[3] - (s[3] >> 1)
        a5 = -s[1] + s[7] + s[5] + (s[5] >> 1)
        a7 = s[3] + s[5] + s[1] + (s[1] >> 1)
        b1, b3 = (a7 >> 2) + a1, a3 + (a5 >> 2)
        b5, b7 = (a3 >> 2) - a5, a7 - (a1 >> 2)
        for k, v in enumerate([b0+b7, b2+b5, b4+b3, b6+b1,
                               b6-b1, b4-b3, b2-b5, b0-b7]):
            put(k, v)

    for i in range(8):       # SRC(x)=dct[x][i], DST(x)=dct[x][i]
        pass1d(lambda x: dct[x][i],
               lambda x, v: dct.__setitem__((x, i), v))
    tr = np.zeros((8, 8), np.int64)
    for i in range(8):       # SRC(x)=dct[i][x]; DST writes dst[x][i]
        pass1d(lambda x: dct[i][x],
               lambda x, v: tr.__setitem__((x, i), v))
    out = pred.astype(np.int64) + (tr >> 6)
    return np.clip(out, 0, 255)


def oracle_quant8(coef, qp, intra):
    li = 0 if intra else 1
    mf = T8.QUANT8_MF[li, qp]
    f = T8.QUANT8_BIAS[li, qp]
    out = np.where(coef > 0,
                   (f + coef) * mf >> 16,
                   -((f - coef) * mf >> 16))
    return out.astype(np.int64)


def oracle_dequant8(lev, qp, intra):
    li = 0 if intra else 1
    dmf = T8.DEQUANT8_MF[li, qp % 6]
    qbits = qp // 6 - 6
    if qbits >= 0:
        return (lev * dmf) << qbits
    f = 1 << (-qbits - 1)
    return (lev * dmf + f) >> (-qbits)


def test_dct8_matches_oracle():
    # x264's sub8x8_dct8 stores the TRANSPOSE of the spec coefficient
    # matrix (DST dct[x][i]) and compensates inside its zigzag macro
    # (dct.c:491 ZIG(i,y,x)=dct[0][x*8+y]); our kernel returns the
    # spec orientation C[r][c] directly so the (r,c) zigzag applies —
    # hence the .T on the literal-port oracle. Conformance of this
    # orientation is pinned by tests/test_ffmpeg_conformance.py and
    # the reference-bitstream decode in test_ref_interop.py.
    res = rng.randint(-255, 256, (20, 8, 8)).astype(np.int32)
    got = np.asarray(T8.dct8x8(jnp.asarray(res)))
    for i in range(20):
        np.testing.assert_array_equal(got[i], oracle_dct8(res[i]).T,
                                      err_msg=f"block {i}")


def test_idct8_matches_oracle():
    # our kernel consumes the spec orientation (= transpose of the
    # x264 in-memory layout the literal-port oracle expects)
    coef = rng.randint(-2000, 2000, (20, 8, 8)).astype(np.int32)
    pred = rng.randint(0, 256, (20, 8, 8)).astype(np.int32)
    got = np.asarray(T8.idct8x8_add(jnp.asarray(pred),
                                    jnp.asarray(coef)))
    for i in range(20):
        np.testing.assert_array_equal(
            got[i], oracle_idct8_add(pred[i], coef[i].T),
            err_msg=f"block {i}")


def test_quant_dequant_match_oracle():
    for qp in (0, 10, 26, 37, 51):
        for intra in (False, True):
            coef = rng.randint(-8000, 8000, (8, 8, 8)).astype(np.int32)
            ql = np.asarray(T8.quant8x8(jnp.asarray(coef), qp, intra))
            for i in range(8):
                np.testing.assert_array_equal(
                    ql[i], oracle_quant8(coef[i], qp, intra))
            dq = np.asarray(T8.dequant8x8(jnp.asarray(ql), qp, intra))
            for i in range(8):
                np.testing.assert_array_equal(
                    dq[i], oracle_dequant8(ql[i], qp, intra))


def test_roundtrip_quality_and_zigzag():
    # full chain at a moderate QP must reconstruct closely
    res = rng.randint(-60, 61, (16, 8, 8)).astype(np.int32)
    pred = rng.randint(0, 196, (16, 8, 8)).astype(np.int32)
    cur = np.clip(pred + res, 0, 255)
    coef = T8.dct8x8(jnp.asarray(cur.astype(np.int32) - pred))
    lev = T8.quant8x8(coef, 20, False)
    deq = T8.dequant8x8(lev, 20, False)
    rec = np.asarray(T8.idct8x8_add(jnp.asarray(pred), deq))
    err = np.abs(rec.astype(np.int64) - cur)
    assert err.mean() < 3.0 and err.max() <= 20, (err.mean(), err.max())

    zz = T8.ZIGZAG_8x8
    assert zz.shape == (64, 2)
    assert tuple(zz[0]) == (0, 0) and tuple(zz[1]) == (0, 1)
    assert tuple(zz[2]) == (1, 0) and tuple(zz[63]) == (7, 7)
    # each diagonal visited contiguously
    d = zz[:, 0] + zz[:, 1]
    assert (np.diff(d) >= 0).all()


def test_cqm_tables():
    # jvt preset tables differ from flat and stay positive
    q, b, d = T8.build_tables8(T8.JVT8I, T8.JVT8P)
    assert (q > 0).all() and (b >= 0).all() and (d > 0).all()
    assert not np.array_equal(q, T8.QUANT8_MF)
    # flat default reproduces set.c:122-123 position classes
    cls = T8._pos_class8()
    assert cls[0, 0] == 0 and cls[1, 1] == 1 and cls[2, 2] == 2
