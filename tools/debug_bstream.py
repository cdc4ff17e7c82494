"""Pin the B-stream deblock corner: capture the decoder's deblock
inputs per frame, diff against FFmpeg, and for each differing edge
group dump the two blocks' motion state + test which bS would
reproduce FFmpeg's pixels.

Usage: python tools/debug_bstream.py tests/fixtures/refstreams/bframes2.264
"""

import sys

import numpy as np

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import cv2

from video_steganography_pcamv_tpu import native
from video_steganography_pcamv_tpu.decoder import decode_annexb

W, H = 96, 64

captures = []
_real = native.deblock_frame


def _spy(y, u, v, intra, nnz4, mv, skip, qp, qpc, **kw):
    captures.append(dict(pre_y=y.copy(), intra=intra.copy(),
                         nnz4=np.asarray(nnz4).copy(),
                         mv=np.asarray(mv).copy(),
                         skip=(None if skip is None else skip.copy()),
                         qp=qp, qpc=qpc,
                         kw={k: (None if val is None
                                 else np.asarray(val).copy())
                             for k, val in kw.items()}))
    r = _real(y, u, v, intra, nnz4, mv, skip, qp, qpc, **kw)
    captures[-1]["post_y"] = y.copy()
    return r


def main():
    path = sys.argv[1]
    native.deblock_frame = _spy
    import video_steganography_pcamv_tpu.decoder.decoder as DD
    # decoder.py does `from .. import native` then native.deblock_frame
    bs = open(path, "rb").read()
    ours = decode_annexb(bs)
    native.deblock_frame = _real

    cap = cv2.VideoCapture(path, cv2.CAP_FFMPEG)
    cap.set(cv2.CAP_PROP_CONVERT_RGB, 0)
    ff = []
    while True:
        ret, f = cap.read()
        if not ret:
            break
        ff.append(f[:H, :W].copy())
    cap.release()

    print(f"{len(ours)} repo frames, {len(ff)} ffmpeg frames, "
          f"{len(captures)} deblock captures")
    for i, (a, b) in enumerate(zip(ours, ff)):
        d = (a.y.astype(int) - b.astype(int))
        if not d.any():
            continue
        ys, xs = np.nonzero(d)
        print(f"\n=== frame {i} (display) type={a.slice_type}: "
              f"{len(ys)} diff pixels, max |d|={np.abs(d).max()}")
        # cluster by 4x4 block
        blocks = sorted(set(zip(ys // 4, xs // 4)))
        print("  diff 4x4 blocks (by4y,b4x):", blocks[:20])
        for by, bx in blocks[:20]:
            mb_y, mb_x = by // 4, bx // 4
            print(f"  block b4=({by},{bx}) in MB ({mb_y},{mb_x}) "
                  f"in-MB 4x4 ({by % 4},{bx % 4})")
            print("    pix rows (ours vs ff):")
            for yy in range(4 * by, 4 * by + 4):
                row = d[yy, 4 * bx:4 * bx + 4]
                if row.any():
                    print(f"      y={yy}: ours "
                          f"{a.y[yy, 4*bx:4*bx+4].tolist()} ff "
                          f"{b[yy, 4*bx:4*bx+4].tolist()}")

    # map captures (coding order) to display order via slice order;
    # dump motion state around differing edges for B frames
    # captures are in coding order; 'ours' frames are display order.
    # Correlate by matching post_y planes.
    for i, (a, b) in enumerate(zip(ours, ff)):
        d = (a.y.astype(int) - b.astype(int))
        if not d.any():
            continue
        capm = None
        for c in captures:
            if np.array_equal(c["post_y"][:H, :W], a.y):
                capm = c
                break
        if capm is None:
            print(f"frame {i}: no capture matched (deblock off?)")
            continue
        ys, xs = np.nonzero(d)
        blocks = sorted(set(zip(ys // 4, xs // 4)))
        mv0 = capm["mv"]
        ref0 = capm["kw"].get("ref4")
        mv1 = capm["kw"].get("mv_l1")
        ref1 = capm["kw"].get("ref4_l1")
        nnz = capm["nnz4"]
        for by, bx in blocks:
            # candidate edges: vertical edge at left of this block, or
            # right (p-side writes reach 3 px into left block); also
            # horizontal. Dump state of this block and neighbours.
            print(f"\nframe {i} block ({by},{bx}):")
            for dy2, dx2, tag in ((0, 0, "self"), (0, -1, "left"),
                                  (0, 1, "right"), (-1, 0, "top"),
                                  (1, 0, "bot")):
                qy, qx = by + dy2, bx + dx2
                if not (0 <= qy < nnz.shape[0] and 0 <= qx < nnz.shape[1]):
                    continue
                print(f"  {tag}({qy},{qx}): nnz={nnz[qy,qx]} "
                      f"l0 ref={None if ref0 is None else ref0[qy,qx]} "
                      f"mv={mv0[qy,qx].tolist()}"
                      + (f" l1 ref={ref1[qy,qx]} mv={mv1[qy,qx].tolist()}"
                         if mv1 is not None else ""))
            mb_y, mb_x = by // 4, bx // 4
            print(f"  MB({mb_y},{mb_x}): intra={capm['intra'][mb_y,mb_x]} "
                  f"skip={None if capm['skip'] is None else capm['skip'][mb_y,mb_x]} "
                  f"qp={capm['qp']}")


if __name__ == "__main__":
    main()
