"""Step 3 of the B-deblock corner hunt: per-EDGE-GROUP brute force.

Capture each B frame's deblock inputs, then replay the native deblocker
with forced bS on candidate 4-sample edge groups (via the
pcamv_set_bs_override hook) until the output matches FFmpeg bit-exactly.
Prints every satisfying assignment together with the motion/nnz state of
the two sides, so the predictive rule can be read off the data.

Usage: python tools/debug_bstream3.py tests/fixtures/refstreams/bframes2.264
"""

import ctypes
import itertools
import sys

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import cv2

from video_steganography_pcamv_tpu import native
from video_steganography_pcamv_tpu.decoder import decode_annexb

W, H = 96, 64
MBH, MBW = H // 16, W // 16

captures = []
_real = native.deblock_frame


def _spy(y, u, v, intra, nnz4, mv, skip, qp, qpc, **kw):
    captures.append(dict(
        pre=(y.copy(), u.copy(), v.copy()),
        intra=intra.copy(), nnz4=np.asarray(nnz4).copy(),
        mv=np.asarray(mv).copy(),
        skip=None if skip is None else skip.copy(), qp=qp, qpc=qpc,
        kw={k: (None if val is None else np.asarray(val).copy())
            for k, val in kw.items()}))
    r = _real(y, u, v, intra, nnz4, mv, skip, qp, qpc, **kw)
    captures[-1]["post_y"] = y.copy()
    return r


def replay(cap, override):
    """Re-run the native deblock on the captured pre planes with a bS
    override array [MBH*MBW, 2, 4, 4] int8 (-1 = derive)."""
    lib = native.load()
    y, u, v = (cap["pre"][0].copy(), cap["pre"][1].copy(),
               cap["pre"][2].copy())
    ov = np.ascontiguousarray(override, np.int8)
    lib.pcamv_set_bs_override(ov.ctypes.data_as(
        ctypes.POINTER(ctypes.c_int8)))
    try:
        _real(y, u, v, cap["intra"], cap["nnz4"], cap["mv"],
              cap["skip"], cap["qp"], cap["qpc"], **cap["kw"])
    finally:
        lib.pcamv_set_bs_override(None)
    return y


def main():
    path = sys.argv[1]
    native.deblock_frame = _spy
    bs = open(path, "rb").read()
    ours = decode_annexb(bs)
    native.deblock_frame = _real

    cap_v = cv2.VideoCapture(path, cv2.CAP_FFMPEG)
    cap_v.set(cv2.CAP_PROP_CONVERT_RGB, 0)
    ff = []
    while True:
        ret, f = cap_v.read()
        if not ret:
            break
        ff.append(f[:H, :W].copy())
    cap_v.release()

    for i, (a, b) in enumerate(zip(ours, ff)):
        d = a.y.astype(int) - b.astype(int)
        if not d.any():
            continue
        capm = next((c for c in captures
                     if np.array_equal(c["post_y"][:H, :W], a.y)), None)
        if capm is None:
            print(f"frame {i}: diff but no capture matched")
            continue
        ys, xs = np.nonzero(d)
        mbs = sorted(set((y // 16, x // 16) for y, x in zip(ys, xs)))
        print(f"\n=== frame {i}: {len(ys)} diff px, MBs {mbs}")
        # candidate groups: every INTERNAL edge group of diff MBs and
        # their left/top neighbours with derived bS == 0
        cands = []
        for (my, mx) in {m for mm in mbs
                         for m in (mm, (mm[0], mm[1] - 1),
                                   (mm[0] - 1, mm[1]), (mm[0], mm[1]+1),
                                   (mm[0]+1, mm[1]))}:
            if not (0 <= my < MBH and 0 <= mx < MBW):
                continue
            mb = my * MBW + mx
            for dir_ in (0, 1):
                for e in range(4):
                    if e == 0 and (mx == 0 if dir_ == 0 else my == 0):
                        continue
                    for g in range(4):
                        cands.append((mb, dir_, e, g))
        base = np.full((MBH * MBW, 2, 4, 4), -1, np.int8)
        y0 = replay(capm, base)
        assert np.array_equal(y0[:H, :W], a.y), "replay mismatch"

        found = []
        for n in (1, 2, 3):
            for combo in itertools.combinations(cands, n):
                ov = base.copy()
                for (mb, dir_, e, g) in combo:
                    ov[mb, dir_, e, g] = 1
                yr = replay(capm, ov)
                if np.array_equal(yr[:H, :W], b):
                    found.append(combo)
            if found:
                break
        if not found:
            print("  no <=3-group bS=1 assignment reproduces FFmpeg;"
                  " trying bS=2 singles+pairs")
            for n in (1, 2, 3):
                for combo in itertools.combinations(cands, n):
                    ov = base.copy()
                    for (mb, dir_, e, g) in combo:
                        ov[mb, dir_, e, g] = 2
                    yr = replay(capm, ov)
                    if np.array_equal(yr[:H, :W], b):
                        found.append(combo)
                if found:
                    break
        for combo in found[:8]:
            print("  exact with forced groups:")
            for (mb, dir_, e, g) in combo:
                my, mx = mb // MBW, mb % MBW
                print(f"    MB({my},{mx}) dir={dir_} edge={e} group={g}")
        if found:
            # dump motion state for the first assignment's edges
            mv0 = capm["mv"]
            ref0 = capm["kw"].get("ref4")
            mv1 = capm["kw"].get("mv_l1")
            ref1 = capm["kw"].get("ref4_l1")
            nnz = capm["nnz4"]
            for (mb, dir_, e, g) in found[0]:
                my, mx = mb // MBW, mb % MBW
                x = e if dir_ == 0 else g
                y = g if dir_ == 0 else e
                qy, qx = 4 * my + y, 4 * mx + x
                py_, px = (qy, qx - 1) if dir_ == 0 else (qy - 1, qx)
                print(f"    edge MB({my},{mx}) d{dir_} e{e} g{g}: "
                      f"q=({qy},{qx}) nnz={nnz[qy,qx]} "
                      f"l0 r={ref0[qy,qx]} m={mv0[qy,qx].tolist()} "
                      f"l1 r={ref1[qy,qx] if ref1 is not None else None}"
                      f" m={mv1[qy,qx].tolist() if mv1 is not None else None}"
                      f" | p=({py_},{px}) nnz={nnz[py_,px]} "
                      f"l0 r={ref0[py_,px]} m={mv0[py_,px].tolist()} "
                      f"l1 r={ref1[py_,px] if ref1 is not None else None}"
                      f" m={mv1[py_,px].tolist() if mv1 is not None else None}")


if __name__ == "__main__":
    main()
