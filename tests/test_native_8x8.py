"""Native CAVLC twin vs the Python oracle on High-profile 8x8
streams (I_NxN-8x8 intra + P transform_size_8x8), bit-identical.
Closes the PARITY §2.3 gap: under --8x8dct the config-3 hot path now
rides C++."""

import numpy as np
import pytest

from video_steganography_pcamv_tpu import native

pytestmark = pytest.mark.skipif(native.load() is None,
                                reason="native lib unavailable")

rng = np.random.RandomState(11)


def _sparse(shape, p=0.15, mag=8):
    x = rng.randint(-mag, mag + 1, shape).astype(np.int32)
    mask = rng.rand(*shape) < p
    return (x * mask).astype(np.int32)


def test_islice_8x8_matches_python():
    from video_steganography_pcamv_tpu.utils.bitstream import BitWriter
    from video_steganography_pcamv_tpu.encoder.cavlc import FrameCavlc
    mbh, mbw = 4, 5
    n = mbh * mbw
    kind = rng.randint(0, 3, n)              # 0 i16, 1 i4, 2 i8
    mode = rng.randint(0, 4, n).astype(np.int32)
    cmode = rng.randint(0, 4, n).astype(np.int32)
    i4_modes = rng.randint(0, 9, (n, 16)).astype(np.int32)
    i8_modes = rng.randint(0, 9, (n, 4)).astype(np.int32)
    for a in range(n):
        my, mx = a // mbw, a % mbw
        if my == 0 and mode[a] in (0, 3):
            mode[a] = 2
        if mx == 0 and mode[a] in (1, 3):
            mode[a] = 2
        if my == 0 and cmode[a] in (2, 3):
            cmode[a] = 0
        if mx == 0 and cmode[a] in (1, 3):
            cmode[a] = 0
        # keep i4/i8 modes edge-legal enough for the mode predictor
        # (the writer codes any value; availability is not checked)
    cbp_luma = np.where(kind == 0,
                        (rng.rand(n) < 0.6).astype(np.int32) * 15,
                        rng.randint(0, 16, n)).astype(np.int32)
    cbp_chroma = rng.randint(0, 3, n).astype(np.int32)
    luma_dc = _sparse((n, 16), p=0.5, mag=20)
    luma_ac = _sparse((n, 16, 16), p=0.12, mag=6)
    luma_ac[:, :, 0] = 0
    luma8 = _sparse((n, 2, 2, 8, 8), p=0.08, mag=6)
    chroma_dc = _sparse((n, 2, 4), p=0.4, mag=5)
    chroma_ac = _sparse((n, 2, 4, 16), p=0.1, mag=4)
    chroma_ac[..., 0] = 0

    mb_i4 = (kind == 1).astype(np.uint8)
    mb_i8 = (kind == 2).astype(np.uint8)

    bw = BitWriter()
    bw.write(16, 0x1234)
    fc = FrameCavlc(mbw, mbh, trans8_mode=True)
    for a in range(n):
        my, mx = a // mbw, a % mbw
        if kind[a] == 2:
            fc.write_i8x8_mb(
                bw, mx, my, i8_modes[a], int(cmode[a]),
                int(cbp_luma[a]), int(cbp_chroma[a]),
                luma8[a], chroma_dc[a].reshape(2, 2, 2),
                chroma_ac[a].reshape(2, 2, 2, 4, 4), qp_delta=0)
        elif kind[a] == 1:
            fc.write_i4x4_mb(
                bw, mx, my, i4_modes[a], int(cmode[a]),
                int(cbp_luma[a]), int(cbp_chroma[a]),
                luma_ac[a].reshape(4, 4, 4, 4),
                chroma_dc[a].reshape(2, 2, 2),
                chroma_ac[a].reshape(2, 2, 2, 4, 4), qp_delta=0)
        else:
            fc.write_i16x16_mb(
                bw, mx, my, int(mode[a]), int(cmode[a]),
                15 if cbp_luma[a] else 0, int(cbp_chroma[a]),
                luma_dc[a].reshape(4, 4),
                luma_ac[a].reshape(4, 4, 4, 4),
                chroma_dc[a].reshape(2, 2, 2),
                chroma_ac[a].reshape(2, 2, 2, 4, 4), qp_delta=0)
    bw.rbsp_trailing()
    ref = bw.get_bytes()

    got = native.write_slice(
        b"\x12\x34", 16, 2, mbw, mbh, mode=mode, cmode=cmode,
        cbp_luma=np.where(kind == 0, np.where(cbp_luma > 0, 15, 0),
                          cbp_luma).astype(np.int32),
        cbp_chroma=cbp_chroma,
        luma_dc=luma_dc, luma_blocks=luma_ac,
        chroma_dc=chroma_dc, chroma_ac=chroma_ac,
        mb_i4=mb_i4, i4_modes=i4_modes,
        mb_i8=mb_i8, i8_modes=i8_modes, luma8_lev=luma8,
        trans8_mode=True)
    assert got == ref


def test_pslice_trans8_matches_python():
    from video_steganography_pcamv_tpu.utils.bitstream import BitWriter
    from video_steganography_pcamv_tpu.encoder.cavlc import FrameCavlc
    mbh, mbw = 4, 6
    n = mbh * mbw
    skip = (rng.rand(n) < 0.25).astype(np.uint8)
    part = rng.randint(0, 4, n).astype(np.int32)
    mvd4 = rng.randint(-9, 10, (n, 4, 2)).astype(np.int32)
    cbp_luma = rng.randint(0, 16, n).astype(np.int32)
    cbp_chroma = rng.randint(0, 3, n).astype(np.int32)
    trans8 = ((rng.rand(n) < 0.5) & (cbp_luma > 0)).astype(np.uint8)
    luma_lev = _sparse((n, 16, 16), p=0.12, mag=6)
    luma8 = _sparse((n, 2, 2, 8, 8), p=0.08, mag=6)
    chroma_dc = _sparse((n, 2, 4), p=0.4, mag=5)
    chroma_ac = _sparse((n, 2, 4, 16), p=0.1, mag=4)
    chroma_ac[..., 0] = 0
    NU = [1, 2, 2, 4]

    bw = BitWriter()
    bw.write(16, 0x1234)
    fc = FrameCavlc(mbw, mbh, trans8_mode=True)
    skip_run = 0
    for a in range(n):
        my, mx = a // mbw, a % mbw
        if skip[a]:
            skip_run += 1
            fc.set_mb_nnz_zero(mx, my)
            continue
        bw.write_ue(skip_run)
        skip_run = 0
        fc.write_p_mb(
            bw, mx, my, int(part[a]), mvd4[a, :NU[part[a]]],
            int(cbp_luma[a]), int(cbp_chroma[a]),
            luma_lev[a].reshape(4, 4, 4, 4),
            chroma_dc[a].reshape(2, 2, 2),
            chroma_ac[a].reshape(2, 2, 2, 4, 4), qp_delta=0,
            trans8=bool(trans8[a]), luma8_lev=luma8[a])
    if skip_run:
        bw.write_ue(skip_run)
    bw.rbsp_trailing()
    ref = bw.get_bytes()

    got = native.write_slice(
        b"\x12\x34", 16, 0, mbw, mbh,
        skip=skip, part=part, mvd4=mvd4,
        cbp_luma=cbp_luma, cbp_chroma=cbp_chroma,
        luma_blocks=luma_lev, chroma_dc=chroma_dc,
        chroma_ac=chroma_ac,
        trans8=trans8, luma8_lev=luma8, trans8_mode=True)
    assert got == ref
