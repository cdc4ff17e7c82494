"""Minimal Matroska muxer for H.264 elementary streams.

Reference: /root/reference/matroska.c:276-515 (mk_createWriter,
mk_writeHeader, mk_startFrame/mk_addFrameData/mk_setFrameFlags,
mk_close) and the MKV output seam in muxers.c:861-1004. Host-side IO —
pure Python is the right tool here (the reference's C is equally
IO-bound).

Layout: EBML header -> Segment { Info, Tracks, Cluster* }. Each frame
becomes one SimpleBlock (length-prefixed NALs, avcC CodecPrivate built
from the stream's SPS/PPS, like muxers.c:885-919 deriving private data
from the first NALs). Duration is patched on close (mk_close's seek-
back, matroska.c:489-504).
"""

from __future__ import annotations

import struct


def ebml_id(val: int) -> bytes:
    out = []
    while val:
        out.append(val & 0xFF)
        val >>= 8
    return bytes(reversed(out))


def ebml_size(val: int, length: int = 0) -> bytes:
    """EBML variable-size integer."""
    if length == 0:
        length = 1
        while val >= (1 << (7 * length)) - 1:
            length += 1
    out = val | (1 << (7 * length))
    return out.to_bytes(length, "big")


def elem(eid: int, payload: bytes) -> bytes:
    return ebml_id(eid) + ebml_size(len(payload)) + payload


def uint_elem(eid: int, val: int) -> bytes:
    n = 1
    while val >= (1 << (8 * n)):
        n += 1
    return elem(eid, val.to_bytes(n, "big"))


def float_elem(eid: int, val: float) -> bytes:
    return elem(eid, struct.pack(">f", val))


def str_elem(eid: int, s: str) -> bytes:
    return elem(eid, s.encode())


def split_annexb(data: bytes):
    """Annex-B -> list of raw NAL payloads."""
    spans = []  # (prefix_start, payload_start)
    i, n = 0, len(data)
    while i < n - 2:
        if data[i] == 0 and data[i + 1] == 0 and data[i + 2] == 1:
            pfx = i
            while pfx > 0 and data[pfx - 1] == 0 and i - pfx < 1:
                pfx -= 1  # include a single extra zero (4-byte code)
            spans.append((pfx, i + 3))
            i += 3
        else:
            i += 1
    nals = []
    for k, (_, s) in enumerate(spans):
        e = spans[k + 1][0] if k + 1 < len(spans) else n
        nals.append(data[s:e])
    return nals


def avcc_private(sps: bytes, pps: bytes) -> bytes:
    return (bytes([1, sps[1], sps[2], sps[3], 0xFF, 0xE1])
            + struct.pack(">H", len(sps)) + sps
            + b"\x01" + struct.pack(">H", len(pps)) + pps)


class MkvWriter:
    """mk_createWriter/mk_writeHeader/mk_close equivalent."""

    TIMESCALE = 1000000  # ns per tick -> ms timecodes

    def __init__(self, path: str, width: int, height: int,
                 fps_num: int = 25, fps_den: int = 1):
        self.f = open(path, "wb")
        self.w, self.h = width, height
        self.fps = fps_num / fps_den
        self.frame_idx = 0
        self.sps = self.pps = None
        self.header_written = False
        self.duration_pos = None

    def _write_header(self):
        ebml = (uint_elem(0x4286, 1)            # EBMLVersion
                + uint_elem(0x42F7, 1)          # EBMLReadVersion
                + uint_elem(0x42F2, 4)          # EBMLMaxIDLength
                + uint_elem(0x42F3, 8)          # EBMLMaxSizeLength
                + str_elem(0x4282, "matroska")  # DocType
                + uint_elem(0x4287, 2)          # DocTypeVersion
                + uint_elem(0x4285, 2))         # DocTypeReadVersion
        self.f.write(elem(0x1A45DFA3, ebml))
        # Segment with unknown size (streamed)
        self.f.write(ebml_id(0x18538067) + b"\x01" + b"\xff" * 7)

        info = (uint_elem(0x2AD7B1, self.TIMESCALE)
                + str_elem(0x4D80, "pcamv-tpu")      # MuxingApp
                + str_elem(0x5741, "pcamv-tpu"))     # WritingApp
        # Duration placeholder (patched in close)
        info += elem(0x4489, struct.pack(">f", 0.0))
        blob = elem(0x1549A966, info)
        self.duration_pos = (self.f.tell() + len(blob)
                             - 4)  # last 4 bytes = the float
        self.f.write(blob)

        video = (uint_elem(0xB0, self.w) + uint_elem(0xBA, self.h)
                 + uint_elem(0x54B0, self.w) + uint_elem(0x54BA, self.h))
        track = (uint_elem(0xD7, 1)              # TrackNumber
                 + uint_elem(0x73C5, 1)          # TrackUID
                 + uint_elem(0x83, 1)            # TrackType video
                 + str_elem(0x86, "V_MPEG4/ISO/AVC")
                 + elem(0x63A2, avcc_private(self.sps, self.pps))
                 + uint_elem(0x23E383,
                             int(1e9 / self.fps))  # DefaultDuration
                 + elem(0xE0, video))
        self.f.write(elem(0x1654AE6B, elem(0xAE, track)))
        self.header_written = True

    def add_frame(self, annexb: bytes, timecode_ms: int | None = None):
        """One access unit (Annex-B, possibly with SPS/PPS). With B
        frames the encoder emits AUs in decode order: pass each AU's
        display-order timecode_ms (mk_startFrame per AU, matroska.c);
        empty chunks (frames still buffered for reordering) are
        skipped."""
        nals = split_annexb(annexb)
        payload = b""
        keyframe = False
        for nal in nals:
            t = nal[0] & 0x1F
            if t == 7:
                self.sps = nal
                continue
            if t == 8:
                self.pps = nal
                continue
            if t == 5:
                keyframe = True
            payload += struct.pack(">I", len(nal)) + nal
        if not payload:
            return
        if not self.header_written:
            assert self.sps and self.pps, "first frame must carry SPS/PPS"
            self._write_header()
        tc = (int(timecode_ms) if timecode_ms is not None
              else int(self.frame_idx * 1000 / self.fps))
        # SimpleBlock: track 1, relative timecode 0, flags
        sb = (b"\x81" + struct.pack(">h", 0)
              + (b"\x80" if keyframe else b"\x00") + payload)
        cluster = uint_elem(0xE7, tc) + elem(0xA3, sb)
        self.f.write(elem(0x1F43B675, cluster))
        self.frame_idx += 1

    def close(self):
        if self.duration_pos is not None and self.frame_idx:
            end = self.f.tell()
            self.f.seek(self.duration_pos)
            self.f.write(struct.pack(
                ">f", self.frame_idx * 1000.0 / self.fps))
            self.f.seek(end)
        self.f.close()
