"""Custom quantization matrices (--cqm jvt / custom lists): SPS
seq_scaling_matrix signalling, scaled quant/dequant on both sides,
bit-exact round trips. Reference: common/set.c x264_cqm_init
(quant_mf = DIV(def*16, scale), dequant_mf = def*scale), set.h JVT
preset tables, spec 7.3.2.1.1 scaling_list()."""

import numpy as np
import pytest

from video_steganography_pcamv_tpu.params import Params
from video_steganography_pcamv_tpu.utils.yuv import Frame
from video_steganography_pcamv_tpu.encoder.core import Encoder
from video_steganography_pcamv_tpu.decoder import decode_annexb
from video_steganography_pcamv_tpu.ops import cqm as Q

W, H = 128, 96


@pytest.fixture(autouse=True)
def _restore_flat():
    yield
    Q.set_cqm()   # never leak a CQM/deadzone into other test modules


def _frames(n, seed=6):
    rng = np.random.RandomState(seed)
    yy, xx = np.mgrid[0:H, 0:W]
    out = []
    for i in range(n):
        base = (60 + 0.7 * xx + 0.4 * yy
                + 20 * np.sin((xx + 4 * i) / 11.0))
        y = np.clip(base + rng.randn(H, W) * 4, 0, 255).astype(np.uint8)
        out.append(Frame(y, np.full((H // 2, W // 2), 100, np.uint8),
                         np.full((H // 2, W // 2), 140, np.uint8)))
    return out


def test_table_build_matches_flat_identity():
    from video_steganography_pcamv_tpu.ops import transform as T
    mf, bi, bp, dq = T._build_tables(np.full(16, 16))
    np.testing.assert_array_equal(mf, T._build_tables()[0])
    np.testing.assert_array_equal(dq, T._build_tables()[3])


@pytest.mark.parametrize("with8", [False, True])
def test_cqm_jvt_roundtrip(with8):
    frames = _frames(4)
    p = Params(width=W, height=H, qp=26, me_range=8, cqm="jvt",
               transform_8x8=with8)
    enc = Encoder(p)
    enc.keep_recon = True
    bs = b"".join(enc.encode_frame(f) for f in frames)
    dec = decode_annexb(bs)
    assert len(dec) == 4
    for i, d in enumerate(dec):
        ry = enc.recon_by_disp[i][0][:H, :W].astype(np.uint8)
        np.testing.assert_array_equal(d.y, ry, err_msg=f"frame {i}")
        ru = enc.recon_by_disp[i][1][:H // 2, :W // 2].astype(np.uint8)
        np.testing.assert_array_equal(d.u, ru, err_msg=f"frame {i} u")
    # the stream must actually signal the matrices
    from video_steganography_pcamv_tpu.decoder.decoder import (
        parse_nals, parse_sps)
    for t, _, rbsp in parse_nals(bs):
        if t == 7:
            sps = parse_sps(rbsp)
            assert sps.scaling is not None
            np.testing.assert_array_equal(sps.scaling[0], Q.JVT4I)
            np.testing.assert_array_equal(sps.scaling[1], Q.JVT4P)
            break
    # and the coded output must differ from the flat encode
    Q.set_cqm()
    enc2 = Encoder(Params(width=W, height=H, qp=26, me_range=8,
                          transform_8x8=with8))
    bs2 = b"".join(enc2.encode_frame(f) for f in frames)
    assert bs != bs2


def test_cqm_custom_lists_roundtrip():
    frames = _frames(4, seed=9)
    c4 = tuple(np.clip(np.arange(16) * 2 + 8, 8, 40).tolist())
    c8 = tuple(np.clip(np.arange(64) + 10, 10, 70).tolist())
    p = Params(width=W, height=H, qp=26, me_range=8,
               cqm4i=c4, cqm4p=c4, cqm8i=c8, cqm8p=c8,
               transform_8x8=True)
    enc = Encoder(p)
    enc.keep_recon = True
    bs = b"".join(enc.encode_frame(f) for f in frames)
    dec = decode_annexb(bs)
    for i, d in enumerate(dec):
        ry = enc.recon_by_disp[i][0][:H, :W].astype(np.uint8)
        np.testing.assert_array_equal(d.y, ry, err_msg=f"frame {i}")


def test_trellis_tables_track_cqm():
    """ops/trellis.py must rate against the live CQM-scaled quantizer
    (rdo.c uses h->quant4_mf/unquant4_mf, which are CQM-scaled)."""
    from video_steganography_pcamv_tpu.ops.trellis import (
        _mf_unq_zig, _mf_unq_zig8)
    flat4, _ = _mf_unq_zig(Q.version())
    flat8, _ = _mf_unq_zig8(Q.version())
    Q.set_preset("jvt")
    mf4, unq4 = _mf_unq_zig(Q.version())
    mf8, _ = _mf_unq_zig8(Q.version())
    assert not np.array_equal(mf4, flat4)
    assert not np.array_equal(mf8, flat8)
    # intra and inter lists differ under jvt
    assert not np.array_equal(mf4[0], mf4[1])
    # unq inverts mf on representative levels: lvl=coef*mf>>16 with
    # coef=(lvl*unq+128)>>8 must reproduce lvl
    for qp in (20, 30):
        for lvl in (1, 3, 7):
            coef = (lvl * unq4[1, qp].astype(np.int64) + 128) >> 8
            back = (coef * mf4[1, qp].astype(np.int64) + (1 << 15)) >> 16
            np.testing.assert_array_equal(back, lvl)


def test_cqm_trellis_roundtrip():
    """--cqm jvt --trellis 1 --cabac --8x8dct: the full High-profile RD
    stack over scaled matrices decodes bit-exactly and beats/equals the
    non-trellis encode size at equal settings."""
    frames = _frames(5, seed=11)
    p = Params(width=W, height=H, qp=27, me_range=8, cqm="jvt",
               cabac=True, trellis=1, transform_8x8=True)
    enc = Encoder(p)
    enc.keep_recon = True
    bs = b"".join(enc.encode_frame(f) for f in frames)
    dec = decode_annexb(bs)
    assert len(dec) == 5
    for i, d in enumerate(dec):
        ry = enc.recon_by_disp[i][0][:H, :W].astype(np.uint8)
        np.testing.assert_array_equal(d.y, ry, err_msg=f"frame {i}")
        ru = enc.recon_by_disp[i][1][:H // 2, :W // 2].astype(np.uint8)
        np.testing.assert_array_equal(d.u, ru, err_msg=f"frame {i} u")

    enc0 = Encoder(Params(width=W, height=H, qp=27, me_range=8,
                          cqm="jvt", cabac=True, trellis=0,
                          transform_8x8=True))
    bs0 = b"".join(enc0.encode_frame(f) for f in frames)
    assert len(bs) <= len(bs0), (len(bs), len(bs0))


def test_cqm_aq_roundtrip():
    """--cqm jvt + AQ: per-MB QP indexes the scaled per-qp tables."""
    frames = _frames(4, seed=13)
    p = Params(width=W, height=H, qp=27, me_range=8, cqm="jvt",
               aq_mode=1, cabac=True)
    enc = Encoder(p)
    enc.keep_recon = True
    bs = b"".join(enc.encode_frame(f) for f in frames)
    dec = decode_annexb(bs)
    for i, d in enumerate(dec):
        ry = enc.recon_by_disp[i][0][:H, :W].astype(np.uint8)
        np.testing.assert_array_equal(d.y, ry, err_msg=f"frame {i}")


def test_deadzone_changes_stream():
    """--deadzone-inter/intra (x264 set.c:76 bias numerators):
    encoder-side only — streams stay decodable, coded levels differ."""
    frames = _frames(3, seed=3)
    p1 = Params(width=W, height=H, qp=26, me_range=8)
    enc1 = Encoder(p1)
    bs1 = b"".join(enc1.encode_frame(f) for f in frames)
    Q.set_cqm()
    p2 = Params(width=W, height=H, qp=26, me_range=8,
                deadzone_inter=0, deadzone_intra=0)
    enc2 = Encoder(p2)
    enc2.keep_recon = True
    bs2 = b"".join(enc2.encode_frame(f) for f in frames)
    assert bs1 != bs2
    dec = decode_annexb(bs2)
    for i, d in enumerate(dec):
        ry = enc2.recon_by_disp[i][0][:H, :W].astype(np.uint8)
        np.testing.assert_array_equal(d.y, ry, err_msg=f"frame {i}")
