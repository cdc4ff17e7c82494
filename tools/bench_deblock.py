"""Benchmark + cross-validate the fused Pallas deblock vs the XLA
knight-wavefront twin on the real chip at a given resolution.

Usage: python tools/bench_deblock.py [mbh mbw iters]
"""

import sys
import time

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax.numpy as jnp


def main():
    mbh = int(sys.argv[1]) if len(sys.argv) > 1 else 68
    mbw = int(sys.argv[2]) if len(sys.argv) > 2 else 120
    iters = int(sys.argv[3]) if len(sys.argv) > 3 else 5

    from video_steganography_pcamv_tpu.ops import deblock_jax as DJ
    from video_steganography_pcamv_tpu.ops import deblock_pallas as DP

    rng = np.random.default_rng(0)
    H, W = 16 * mbh, 16 * mbw
    base = rng.integers(60, 180, (mbh, mbw))
    y = np.clip(np.repeat(np.repeat(base, 16, 0), 16, 1)
                + rng.integers(-24, 25, (H, W)), 0, 255)
    u = np.clip(128 + rng.integers(-24, 25, (H // 2, W // 2)), 0, 255)
    v = np.clip(128 + rng.integers(-24, 25, (H // 2, W // 2)), 0, 255)
    intra = (rng.random((mbh, mbw)) < 0.1).astype(np.int32)
    skip = ((rng.random((mbh, mbw)) < 0.2) & (intra == 0)).astype(np.int32)
    nnz4 = (rng.random((4 * mbh, 4 * mbw)) < 0.5).astype(np.int32)
    mv4 = rng.integers(-20, 21, (4 * mbh, 4 * mbw, 2)).astype(np.int32)
    mv4 = np.repeat(np.repeat(mv4[::2, ::2], 2, 0), 2, 1)
    args = (jnp.asarray(y.astype(np.int32)), jnp.asarray(u.astype(np.int32)),
            jnp.asarray(v.astype(np.int32)), jnp.asarray(intra),
            jnp.asarray(skip), jnp.asarray(nnz4), jnp.asarray(mv4), 32, 32,
            mbh, mbw)

    def sync(out):
        return [np.asarray(o) for o in out]

    for name, fn in (("wavefront", DJ.deblock_frame_device),
                     ("pallas", DP.deblock_frame_pallas)):
        t0 = time.time()
        out = sync(fn(*args))
        t_compile = time.time() - t0
        ts = []
        for _ in range(iters):
            t0 = time.time()
            o = fn(*args)
            # sync on scalars only (tunnel: array pulls are slow)
            _ = [np.asarray(x[0, 0]) for x in o]
            ts.append(time.time() - t0)
        print(f"{name}: first(incl compile) {t_compile*1e3:.0f} ms, "
              f"steady {min(ts)*1e3:.1f} ms (median "
              f"{sorted(ts)[len(ts)//2]*1e3:.1f})")
        if name == "wavefront":
            ref = out
        else:
            for a, b, nm in zip(ref, out, "yuv"):
                ok = np.array_equal(a, b)
                print(f"  plane {nm}: {'BIT-EXACT' if ok else 'MISMATCH '} "
                      f"({(a != b).mean()*100:.3f}% diff)" if not ok else
                      f"  plane {nm}: BIT-EXACT")


if __name__ == "__main__":
    main()
