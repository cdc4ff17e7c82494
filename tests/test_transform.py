"""Transform/quant kernels vs scalar NumPy oracle.

Oracle functions re-state the reference C semantics
(/root/reference/common/dct.c, common/quant.c, encoder/macroblock.c)
as straight-line NumPy on a single 4x4 block; the device kernels must
match elementwise on random data — the checkasm model (SURVEY.md §4.1).
"""

import numpy as np
import jax.numpy as jnp

from video_steganography_pcamv_tpu.ops import transform as T
from video_steganography_pcamv_tpu.ops.blocks import to_blocks, from_blocks

rng = np.random.RandomState(42)


# ------------------------------ oracles ------------------------------------

def oracle_dct4x4(d):
    tmp = np.zeros((4, 4), np.int64)
    out = np.zeros((4, 4), np.int64)
    for i in range(4):
        s03, s12 = d[i][0] + d[i][3], d[i][1] + d[i][2]
        d03, d12 = d[i][0] - d[i][3], d[i][1] - d[i][2]
        tmp[0][i] = s03 + s12
        tmp[1][i] = 2 * d03 + d12
        tmp[2][i] = s03 - s12
        tmp[3][i] = d03 - 2 * d12
    for i in range(4):
        s03, s12 = tmp[i][0] + tmp[i][3], tmp[i][1] + tmp[i][2]
        d03, d12 = tmp[i][0] - tmp[i][3], tmp[i][1] - tmp[i][2]
        out[i][0] = s03 + s12
        out[i][1] = 2 * d03 + d12
        out[i][2] = s03 - s12
        out[i][3] = d03 - 2 * d12
    # reference stores transposed (dct[hfreq][vfreq]); we use natural
    return out.T


def oracle_idct4x4(c):
    tmp = np.zeros((4, 4), np.int64)
    out = np.zeros((4, 4), np.int64)
    for i in range(4):
        s02, d02 = c[0][i] + c[2][i], c[0][i] - c[2][i]
        s13 = c[1][i] + (c[3][i] >> 1)
        d13 = (c[1][i] >> 1) - c[3][i]
        tmp[i][0], tmp[i][1] = s02 + s13, d02 + d13
        tmp[i][2], tmp[i][3] = d02 - d13, s02 - s13
    for i in range(4):
        s02, d02 = tmp[0][i] + tmp[2][i], tmp[0][i] - tmp[2][i]
        s13 = tmp[1][i] + (tmp[3][i] >> 1)
        d13 = (tmp[1][i] >> 1) - tmp[3][i]
        out[0][i], out[1][i] = s02 + s13, d02 + d13
        out[2][i], out[3][i] = d02 - d13, s02 - s13
    return out


def oracle_quant(c, qp, intra):
    mf = T.QUANT4_MF[qp]
    bias = (T.QUANT4_BIAS_INTRA if intra else T.QUANT4_BIAS_INTER)[qp]
    out = np.zeros((4, 4), np.int64)
    for y in range(4):
        for x in range(4):
            v = int(c[y][x])
            if v > 0:
                out[y][x] = (int(bias[y][x]) + v) * int(mf[y][x]) >> 16
            else:
                out[y][x] = -((int(bias[y][x]) - v) * int(mf[y][x]) >> 16)
    return out


def oracle_dequant(l, qp):
    dmf = T.DEQUANT4_MF[qp % 6]
    qbits = qp // 6 - 4
    out = np.zeros((4, 4), np.int64)
    for y in range(4):
        for x in range(4):
            if qbits >= 0:
                out[y][x] = (int(l[y][x]) * int(dmf[y][x])) << qbits
            else:
                f = 1 << (-qbits - 1)
                out[y][x] = (int(l[y][x]) * int(dmf[y][x]) + f) >> (-qbits)
    return out


# ------------------------------ tests ---------------------------------------

def _random_blocks(n=64, lo=-255, hi=256):
    return rng.randint(lo, hi, (n, 4, 4)).astype(np.int32)


def _to_planes(blocks):
    """[N,4,4] block list -> [4,4,1,N] plane layout."""
    return jnp.asarray(blocks.transpose(1, 2, 0)[:, :, None, :])


def _from_planes(planes):
    return np.asarray(planes)[:, :, 0, :].transpose(2, 0, 1)


def test_dct4x4_matches_oracle():
    blocks = _random_blocks()
    got = _from_planes(T.dct4x4(_to_planes(blocks)))
    for b, g in zip(blocks, got):
        np.testing.assert_array_equal(g, oracle_dct4x4(b.astype(np.int64)))


def test_idct4x4_matches_oracle():
    blocks = _random_blocks(lo=-20000, hi=20000)
    got = _from_planes(T.idct4x4(_to_planes(blocks)))
    for b, g in zip(blocks, got):
        # oracle consumes x264's transposed coefficient storage; both
        # apply the horizontal pass first (spec 8.5.12.2 order)
        np.testing.assert_array_equal(g, oracle_idct4x4(b.T.astype(np.int64)))


def test_quant_dequant_match_oracle():
    for qp in [0, 10, 22, 26, 32, 37, 45, 51]:
        blocks = _random_blocks(32, -4000, 4000)
        for intra in (True, False):
            got = _from_planes(T.quant4x4(_to_planes(blocks), qp, intra))
            for b, g in zip(blocks, got):
                np.testing.assert_array_equal(
                    g, oracle_quant(b.astype(np.int64), qp, intra))
        levels = _random_blocks(32, -512, 512)
        got = _from_planes(T.dequant4x4(_to_planes(levels), qp))
        for b, g in zip(levels, got):
            np.testing.assert_array_equal(g, oracle_dequant(b, qp))


def test_roundtrip_reconstruction_error_bounded():
    """fdct -> quant -> dequant -> idct(+32>>6) must approximate the
    residual with error shrinking as QP drops."""
    res = rng.randint(-100, 100, (128, 4, 4)).astype(np.int32)
    planes = _to_planes(res)
    prev_err = None
    for qp in [40, 30, 20, 10]:
        coef = T.dct4x4(planes)
        lev = T.quant4x4(coef, qp, intra=True)
        deq = T.dequant4x4(lev, qp)
        rec = (T.idct4x4(deq) + 32) >> 6
        err = float(jnp.mean(jnp.abs(rec - planes)))
        if prev_err is not None:
            assert err <= prev_err + 1e-6
        prev_err = err
    assert prev_err < 1.5  # qp=10 should be near-lossless


def test_blocks_layout_roundtrip():
    x = jnp.asarray(rng.randint(0, 255, (2, 32, 48)).astype(np.int32))
    b = to_blocks(x)
    assert b.shape == (2, 4, 4, 8, 12)
    np.testing.assert_array_equal(np.asarray(from_blocks(b)), np.asarray(x))
    # plane semantics: b[..., r, c, by, bx] == x[..., 4*by+r, 4*bx+c]
    np.testing.assert_array_equal(np.asarray(b[0, 1, 2, 3, 4]),
                                  np.asarray(x[0, 4 * 3 + 1, 4 * 4 + 2]))


def test_hadamard4x4_forward_inverse_pair():
    """fwd (with >>1) followed by inverse recovers 2x input per x264's
    DC-path scaling convention (common/dct.c:40-105)."""
    dc = rng.randint(-2000, 2000, (16, 4, 4)).astype(np.int32)
    # make even so the (x+1)>>1 in the forward is lossless
    dc = dc * 2
    planes = _to_planes(dc)
    # H(H(x)·Hᵀ)·Hᵀ = 16·x; the forward's >>1 halves that to 8·x
    f = T.hadamard4x4(planes, final_shift=True)
    inv = T.hadamard4x4(f, final_shift=False)
    np.testing.assert_array_equal(np.asarray(inv), np.asarray(planes * 8))


def test_hadamard2x2_self_inverse():
    dc = rng.randint(-2000, 2000, (8, 2, 2)).astype(np.int32)
    planes = jnp.asarray(dc.transpose(1, 2, 0)[:, :, None, :])
    twice = T.hadamard2x2(T.hadamard2x2(planes))
    np.testing.assert_array_equal(np.asarray(twice), np.asarray(planes * 4))


def test_chroma_qp_table():
    assert T.chroma_qp(26) == 26
    assert T.chroma_qp(30) == 29
    assert T.chroma_qp(51) == 39
    assert T.chroma_qp(39) == 35
