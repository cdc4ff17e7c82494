"""i8x8 predictors vs a literal scalar transcription of the reference
(predict.c:505-760 x264_predict_8x8_filter + the nine predict_8x8_*
functions) on random edges/availability."""

import numpy as np
import jax.numpy as jnp

from video_steganography_pcamv_tpu.ops import predict8 as P8

rng = np.random.RandomState(11)


def F1(a, b):
    return (a + b + 1) >> 1


def F2(a, b, c):
    return (a + 2 * b + c + 2) >> 2


def oracle_filter(lt, t, l, have_lt, have_tr):
    e = np.zeros(33, np.int64)
    e[15] = (t[0] + 2 * lt + l[0] + 2) >> 2
    e[14] = ((lt if have_lt else l[0]) + 2 * l[0] + l[1] + 2) >> 2
    for y in range(1, 7):
        e[14 - y] = F2(l[y - 1], l[y], l[y + 1])
    e[7] = (l[6] + 3 * l[7] + 2) >> 2
    e[16] = ((lt if have_lt else t[0]) + 2 * t[0] + t[1] + 2) >> 2
    for x in range(1, 7):
        e[16 + x] = F2(t[x - 1], t[x], t[x + 1])
    e[23] = (t[6] + 2 * t[7] + (t[8] if have_tr else t[7]) + 2) >> 2
    if have_tr:
        for x in range(8, 15):
            e[16 + x] = F2(t[x - 1], t[x], t[x + 1])
        e[31] = e[32] = (t[14] + 3 * t[15] + 2) >> 2
    else:
        e[24:32] = t[7]
        e[32] = t[7]
    return e


def oracle_modes(e, avail_top, avail_left):
    """predict_8x8_{v,h,dc,ddl,ddr,vr,hd,vl,hu} from the filtered edge."""
    l = [e[14 - i] for i in range(8)]
    lt = e[15]
    t = [e[16 + i] for i in range(16)]
    out = np.zeros((9, 8, 8), np.int64)
    out[0] = np.array(t[:8])[None, :].repeat(8, 0)            # V
    out[1] = np.array(l)[:, None].repeat(8, 1)                # H
    if avail_top and avail_left:
        dc = (sum(l) + sum(t[:8]) + 8) >> 4
    elif avail_left:
        dc = (sum(l) + 4) >> 3
    elif avail_top:
        dc = (sum(t[:8]) + 4) >> 3
    else:
        dc = 128
    out[2] = dc
    for y in range(8):
        for x in range(8):
            # ddl
            i = x + y
            out[3, y, x] = (F2(t[14], t[15], t[15]) if i == 14
                            else F2(t[i], t[i + 1], t[i + 2]))
            # ddr
            d = x - y
            src = [e[14 + d], e[15 + d], e[16 + d]]
            out[4, y, x] = F2(*src)
            # vr
            z = 2 * x - y
            i = x - (y >> 1)
            if z >= 0 and z % 2 == 0:
                out[5, y, x] = F1(lt if i - 1 == -1 else t[i - 1], t[i])
            elif z >= 0:
                a = lt if i - 2 == -1 else t[i - 2]
                b = lt if i - 1 == -1 else t[i - 1]
                out[5, y, x] = F2(a, b, t[i])
            elif z == -1:
                out[5, y, x] = F2(l[0], lt, t[0])
            else:
                k = y - 2 * x
                out[5, y, x] = F2(l[k - 1], l[k - 2],
                                  lt if k - 3 == -1 else l[k - 3])
            # hd
            z = 2 * y - x
            i = y - (x >> 1)
            if z >= 0 and z % 2 == 0:
                out[6, y, x] = F1(lt if i - 1 == -1 else l[i - 1], l[i])
            elif z >= 0:
                a = lt if i - 2 == -1 else l[i - 2]
                b = lt if i - 1 == -1 else l[i - 1]
                out[6, y, x] = F2(a, b, l[i])
            elif z == -1:
                out[6, y, x] = F2(t[0], lt, l[0])
            else:
                k = x - 2 * y
                out[6, y, x] = F2(t[k - 1], t[k - 2],
                                  lt if k - 3 == -1 else t[k - 3])
            # vl
            i = x + (y >> 1)
            if y % 2 == 0:
                out[7, y, x] = F1(t[i], t[i + 1])
            else:
                out[7, y, x] = F2(t[i], t[i + 1], t[i + 2])
            # hu
            z = x + 2 * y
            i = y + (x >> 1)
            if z < 13 and z % 2 == 0:
                out[8, y, x] = F1(l[i], l[i + 1])
            elif z < 13:
                out[8, y, x] = F2(l[i], l[i + 1], l[i + 2])
            elif z == 13:
                out[8, y, x] = F2(l[6], l[7], l[7])
            else:
                out[8, y, x] = l[7]
    return out


def _spot_check_vs_x264_layout(e):
    """A handful of literal x264 assignments (predict.c) as anchors."""
    l = [e[14 - i] for i in range(8)]
    lt = e[15]
    t = [e[16 + i] for i in range(16)]
    m = oracle_modes(e, True, True)
    assert m[3, 0, 0] == F2(t[0], t[1], t[2])            # ddl SRC(0,0)
    assert m[3, 7, 7] == F2(t[14], t[15], t[15])
    assert m[4, 7, 0] == F2(l[7], l[6], l[5])            # ddr SRC(0,7)
    assert m[4, 0, 0] == F2(l[0], lt, t[0])
    assert m[5, 0, 0] == F1(lt, t[0])                    # vr SRC(0,0)
    assert m[5, 2, 0] == F2(l[1], l[0], lt)              # vr SRC(0,2)
    assert m[6, 1, 0] == F1(l[0], l[1])                  # hd SRC(0,1)
    assert m[6, 0, 2] == F2(t[1], t[0], lt)              # hd SRC(2,0)
    assert m[7, 0, 0] == F1(t[0], t[1])                  # vl SRC(0,0)
    assert m[7, 7, 7] == F2(t[10], t[11], t[12])
    assert m[8, 0, 0] == F1(l[0], l[1])                  # hu SRC(0,0)
    assert m[8, 7, 7] == l[7]


def test_predict8_matches_oracle():
    N = 24
    lt = rng.randint(0, 256, N)
    top = rng.randint(0, 256, (N, 16))
    left = rng.randint(0, 256, (N, 8))
    have_lt = rng.rand(N) < 0.7
    have_tr = rng.rand(N) < 0.6
    # !have_tr raw substitution: caller passes t8.. = t7 copies
    top_sub = top.copy()
    top_sub[~have_tr, 8:] = top_sub[~have_tr, 7:8]

    e_dev = np.asarray(P8.filter_edges(
        jnp.asarray(lt), jnp.asarray(top_sub), jnp.asarray(left),
        jnp.asarray(have_lt), jnp.asarray(have_tr)))
    preds = np.asarray(P8.predict_i8x8_all(
        jnp.asarray(e_dev), jnp.ones(N, bool), jnp.ones(N, bool)))
    for i in range(N):
        e_ref = oracle_filter(int(lt[i]), top_sub[i].astype(np.int64),
                              left[i].astype(np.int64),
                              bool(have_lt[i]), bool(have_tr[i]))
        np.testing.assert_array_equal(e_dev[i], e_ref,
                                      err_msg=f"edge {i}")
        m_ref = oracle_modes(e_ref, True, True)
        np.testing.assert_array_equal(preds[i], m_ref,
                                      err_msg=f"modes {i}")
        _spot_check_vs_x264_layout(e_ref)


def test_predict8_dc_fallbacks():
    N = 4
    e = jnp.asarray(rng.randint(0, 256, (N, 33)))
    av_t = jnp.asarray([True, False, True, False])
    av_l = jnp.asarray([True, True, False, False])
    p = np.asarray(P8.predict_i8x8_all(e, av_t, av_l))
    e_np = np.asarray(e).astype(np.int64)
    lsum = e_np[:, 14:6:-1].sum(1)
    tsum = e_np[:, 16:24].sum(1)
    assert (p[0, 2] == (lsum[0] + tsum[0] + 8) >> 4).all()
    assert (p[1, 2] == (lsum[1] + 4) >> 3).all()
    assert (p[2, 2] == (tsum[2] + 4) >> 3).all()
    assert (p[3, 2] == 128).all()
