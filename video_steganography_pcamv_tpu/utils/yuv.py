"""YUV420 / Y4M file I/O (reference: /root/reference/muxers.c:63-335).

Readers return numpy uint8 planes; the encoder moves them to device in
batches. A synthetic-sequence generator stands in for the standard test
clips (Foreman/Akiyo are not redistributable and not present here).
"""

from __future__ import annotations

import os
import re
from dataclasses import dataclass

import numpy as np


@dataclass
class Frame:
    y: np.ndarray  # [H, W] uint8
    u: np.ndarray  # [H/2, W/2] uint8
    v: np.ndarray  # [H/2, W/2] uint8

    @property
    def width(self) -> int:
        return self.y.shape[1]

    @property
    def height(self) -> int:
        return self.y.shape[0]


class YUVReader:
    """Raw planar YUV420 reader; frame count from file size
    (reference: muxers.c:63-137)."""

    def __init__(self, path: str, width: int, height: int) -> None:
        self.width = width
        self.height = height
        self._f = open(path, "rb")
        self.frame_size = width * height * 3 // 2
        self.num_frames = os.path.getsize(path) // self.frame_size

    def read(self, idx: int) -> Frame:
        self._f.seek(idx * self.frame_size)
        data = np.frombuffer(self._f.read(self.frame_size), dtype=np.uint8)
        w, h = self.width, self.height
        y = data[: w * h].reshape(h, w)
        u = data[w * h: w * h + w * h // 4].reshape(h // 2, w // 2)
        v = data[w * h + w * h // 4:].reshape(h // 2, w // 2)
        return Frame(y, u, v)

    def close(self) -> None:
        self._f.close()


class Y4MReader:
    """YUV4MPEG2 reader (reference: muxers.c:138-335)."""

    def __init__(self, path: str) -> None:
        self._f = open(path, "rb")
        header = b""
        while not header.endswith(b"\n"):
            header += self._f.read(1)
        m_w = re.search(rb"W(\d+)", header)
        m_h = re.search(rb"H(\d+)", header)
        m_f = re.search(rb"F(\d+):(\d+)", header)
        assert m_w and m_h, "bad y4m header"
        self.width = int(m_w.group(1))
        self.height = int(m_h.group(1))
        self.fps = (int(m_f.group(1)), int(m_f.group(2))) if m_f else (25, 1)
        self._data_start = self._f.tell()
        self.frame_size = self.width * self.height * 3 // 2
        frame_bytes = self.frame_size + 6  # b"FRAME\n"
        size = os.path.getsize(path) - self._data_start
        self.num_frames = size // frame_bytes

    def read(self, idx: int) -> Frame:
        self._f.seek(self._data_start + idx * (self.frame_size + 6))
        marker = self._f.read(6)
        assert marker.startswith(b"FRAME"), marker
        data = np.frombuffer(self._f.read(self.frame_size), dtype=np.uint8)
        w, h = self.width, self.height
        y = data[: w * h].reshape(h, w)
        u = data[w * h: w * h + w * h // 4].reshape(h // 2, w // 2)
        v = data[w * h + w * h // 4:].reshape(h // 2, w // 2)
        return Frame(y, u, v)

    def close(self) -> None:
        self._f.close()


def open_input(path: str, width: int = 0, height: int = 0):
    if path.endswith(".y4m"):
        return Y4MReader(path)
    assert width and height, "raw yuv needs explicit --input-res"
    return YUVReader(path, width, height)


class PrefetchReader:
    """Threaded read-ahead wrapper: a daemon thread pulls frames from
    the underlying reader into a bounded queue so file I/O overlaps
    the encode (the reference's threaded input seam,
    /root/reference/muxers.c:441-517 open_file_thread /
    read_frame_thread, which double-buffers one frame ahead).

    Sequential access contract: read(idx) must be called with
    consecutive indices starting at `start` (the CLI loop's pattern).
    A non-sequential index falls back to a direct synchronous read."""

    def __init__(self, reader, start: int = 0, depth: int = 2):
        import queue
        import threading
        self._r = reader
        self.width = reader.width
        self.height = reader.height
        self.fps = getattr(reader, "fps", (25, 1))
        self.num_frames = reader.num_frames
        self._q = queue.Queue(maxsize=max(1, depth))
        self._next = start
        self._stop = threading.Event()

        def worker():
            i = start
            while not self._stop.is_set() and i < reader.num_frames:
                try:
                    item = (i, reader.read(i))
                except Exception as ex:   # surface on the consumer side
                    self._q.put((i, ex))
                    return
                while not self._stop.is_set():
                    try:
                        self._q.put(item, timeout=0.2)
                        break
                    except Exception:
                        continue
                i += 1

        self._t = threading.Thread(target=worker, daemon=True)
        self._t.start()

    def read(self, idx: int) -> Frame:
        if idx != self._next:
            return self._r.read(idx)      # random access: bypass
        self._next += 1
        i, item = self._q.get()
        assert i == idx
        if isinstance(item, Exception):
            raise item
        return item

    def close(self) -> None:
        self._stop.set()
        try:                    # drain so the worker can exit a put()
            while True:
                self._q.get_nowait()
        except Exception:
            pass
        self._t.join(timeout=2.0)
        self._r.close()


def write_y4m(path: str, frames: list[Frame], fps=(25, 1)) -> None:
    with open(path, "wb") as f:
        w, h = frames[0].width, frames[0].height
        f.write(f"YUV4MPEG2 W{w} H{h} F{fps[0]}:{fps[1]} Ip A1:1 C420mpeg2\n"
                .encode())
        for fr in frames:
            f.write(b"FRAME\n")
            f.write(fr.y.tobytes())
            f.write(fr.u.tobytes())
            f.write(fr.v.tobytes())


def synthetic_sequence(width: int, height: int, n_frames: int,
                       seed: int = 7, motion: float = 2.0) -> list[Frame]:
    """Deterministic moving-texture sequence for tests and benchmarks.

    A textured background pans with subpixel-ish drift plus a few moving
    rectangles; produces a realistic mix of well-predicted and occluded
    macroblocks so ME/pskip/stego paths all get exercised.
    """
    rng = np.random.RandomState(seed)
    big = rng.randint(0, 256, (height * 2, width * 2)).astype(np.float32)
    # low-pass for a natural-ish texture
    k = np.ones(9) / 9.0
    big = np.apply_along_axis(lambda r: np.convolve(r, k, "same"), 1, big)
    big = np.apply_along_axis(lambda c: np.convolve(c, k, "same"), 0, big)
    big = (big - big.min()) / max(1e-6, float(np.ptp(big))) * 220 + 16

    n_rects = 4
    rects = [(rng.randint(0, width), rng.randint(0, height),
              rng.randint(16, 48), rng.randint(16, 48),
              rng.uniform(-3, 3), rng.uniform(-3, 3),
              rng.randint(40, 215)) for _ in range(n_rects)]

    frames = []
    for t in range(n_frames):
        ox = int(round(motion * t)) % width
        oy = int(round(motion * 0.5 * t)) % height
        y = big[oy: oy + height, ox: ox + width].copy()
        for (rx, ry, rw, rh, vx, vy, val) in rects:
            x0 = int(rx + vx * t) % width
            y0 = int(ry + vy * t) % height
            x1 = min(x0 + rw, width)
            y1 = min(y0 + rh, height)
            y[y0:y1, x0:x1] = val
        yp = np.clip(y, 0, 255).astype(np.uint8)
        u = (yp[::2, ::2] // 2 + 64).astype(np.uint8)
        v = (255 - yp[1::2, 1::2] // 2 - 64).astype(np.uint8)
        frames.append(Frame(yp, u, v))
    return frames
