"""i4x4 predictor equivalence vs an independent scalar spec oracle
(spec 8.3.1.2; reference common/predict.c:302-600). checkasm pattern:
random borders, all 9 modes, exact match."""

import numpy as np
import jax.numpy as jnp

from video_steganography_pcamv_tpu.ops.predict import predict_i4x4_all


def oracle_4x4(mode, t, l, lt):
    """Scalar spec implementation. t: t0..t7, l: l0..l3, lt scalar."""
    p = np.zeros((4, 4), np.int64)

    def f2(a, b, c):
        return (a + 2 * b + c + 2) >> 2

    def f1(a, b):
        return (a + b + 1) >> 1

    for y in range(4):
        for x in range(4):
            if mode == 0:          # V
                p[y, x] = t[x]
            elif mode == 1:        # H
                p[y, x] = l[y]
            elif mode == 3:        # DDL
                if x == 3 and y == 3:
                    p[y, x] = (t[6] + 3 * t[7] + 2) >> 2
                else:
                    i = x + y
                    p[y, x] = f2(t[i], t[i + 1], t[i + 2])
            elif mode == 4:        # DDR
                if x > y:
                    k = x - y
                    a = lt if k - 2 == -1 else t[k - 2]
                    p[y, x] = f2(a, lt if k - 1 == -1 else t[k - 1], t[k])
                elif x < y:
                    k = y - x
                    a = lt if k - 2 == -1 else l[k - 2]
                    p[y, x] = f2(a, lt if k - 1 == -1 else l[k - 1], l[k])
                else:
                    p[y, x] = f2(t[0], lt, l[0])
            elif mode == 5:        # VR
                z = 2 * x - y
                i = x - (y >> 1)
                tt = lambda j: lt if j == -1 else t[j]
                if z >= 0 and z % 2 == 0:
                    p[y, x] = f1(tt(i - 1), tt(i))
                elif z >= 0:
                    p[y, x] = f2(tt(i - 2), tt(i - 1), tt(i))
                elif z == -1:
                    p[y, x] = f2(l[0], lt, t[0])
                else:
                    ll = lambda j: lt if j == -1 else l[j]
                    p[y, x] = f2(ll(y - 1), ll(y - 2), ll(y - 3))
            elif mode == 6:        # HD
                z = 2 * y - x
                i = y - (x >> 1)
                ll = lambda j: lt if j == -1 else l[j]
                if z >= 0 and z % 2 == 0:
                    p[y, x] = f1(ll(i - 1), ll(i))
                elif z >= 0:
                    p[y, x] = f2(ll(i - 2), ll(i - 1), ll(i))
                elif z == -1:
                    p[y, x] = f2(t[0], lt, l[0])
                else:
                    tt = lambda j: lt if j == -1 else t[j]
                    p[y, x] = f2(tt(x - 1), tt(x - 2), tt(x - 3))
            elif mode == 7:        # VL
                i = x + (y >> 1)
                if y % 2 == 0:
                    p[y, x] = f1(t[i], t[i + 1])
                else:
                    p[y, x] = f2(t[i], t[i + 1], t[i + 2])
            elif mode == 8:        # HU
                z = x + 2 * y
                i = y + (x >> 1)
                if z < 5 and z % 2 == 0:
                    p[y, x] = f1(l[i], l[i + 1])
                elif z < 5:
                    p[y, x] = f2(l[i], l[i + 1], l[i + 2])
                elif z == 5:
                    p[y, x] = (l[2] + 3 * l[3] + 2) >> 2
                else:
                    p[y, x] = l[3]
    return p


def oracle_dc(t, l, at, al):
    if at and al:
        return (int(np.sum(t[:4])) + int(np.sum(l)) + 4) >> 3
    if at:
        return (int(np.sum(t[:4])) + 2) >> 2
    if al:
        return (int(np.sum(l)) + 2) >> 2
    return 128


def test_i4x4_modes_match_oracle():
    rng = np.random.RandomState(0)
    n = 64
    t = rng.randint(0, 256, (n, 8)).astype(np.int64)
    l = rng.randint(0, 256, (n, 4)).astype(np.int64)
    lt = rng.randint(0, 256, n).astype(np.int64)
    got = np.asarray(predict_i4x4_all(
        jnp.asarray(t, jnp.int32), jnp.asarray(l, jnp.int32),
        jnp.asarray(lt, jnp.int32),
        jnp.ones(n, bool), jnp.ones(n, bool)))
    for i in range(n):
        for mode in range(9):
            if mode == 2:
                exp = np.full((4, 4), oracle_dc(t[i], l[i], True, True))
            else:
                exp = oracle_4x4(mode, t[i], l[i], int(lt[i]))
            np.testing.assert_array_equal(
                got[i, mode], exp, err_msg=f"block {i} mode {mode}")


def test_i4x4_dc_availability():
    rng = np.random.RandomState(1)
    n = 8
    t = rng.randint(0, 256, (n, 8)).astype(np.int64)
    l = rng.randint(0, 256, (n, 4)).astype(np.int64)
    lt = rng.randint(0, 256, n).astype(np.int64)
    for at, al in ((True, False), (False, True), (False, False)):
        got = np.asarray(predict_i4x4_all(
            jnp.asarray(t, jnp.int32), jnp.asarray(l, jnp.int32),
            jnp.asarray(lt, jnp.int32),
            jnp.full(n, at), jnp.full(n, al)))
        for i in range(n):
            exp = np.full((4, 4), oracle_dc(t[i], l[i], at, al))
            np.testing.assert_array_equal(got[i, 2], exp)
