"""Minimal ISO BMFF (MP4) muxer for H.264 elementary streams.

Reference: the GPAC-backed MP4 output seam in
/root/reference/muxers.c:441-637 (mp4_set_param deriving track setup
from SPS/PPS, mp4_write_nalu length-prefixing NALs, mp4_set_eop
composition-offset handling for B reorder, mp4_close_file writing the
movie box). GPAC itself is replaced by ~200 lines of box writing —
host-side IO, pure Python is the right tool (the reference's C is
equally IO-bound).

Layout: ftyp, mdat (samples appended as they arrive, size patched on
close), moov (sample tables built from the buffered per-sample
metadata). Samples are stored in decode order; display order rides
ctts composition offsets (version 0, unsigned: offsets are shifted by
the minimum so the smallest is 0, like GPAC's CTS shift).

Same interface as MkvWriter: add_frame(annexb, timecode_ms) + close().
"""

from __future__ import annotations

import struct

from .mkv import split_annexb, avcc_private

TIMESCALE = 90000


def box(kind: bytes, payload: bytes) -> bytes:
    return struct.pack(">I", 8 + len(payload)) + kind + payload


def full_box(kind: bytes, version: int, flags: int,
             payload: bytes) -> bytes:
    return box(kind, struct.pack(">I", (version << 24) | flags) + payload)


class Mp4Writer:
    def __init__(self, path: str, width: int, height: int,
                 fps_num: int = 25, fps_den: int = 1):
        self.f = open(path, "wb")
        self.w, self.h = width, height
        self.delta = TIMESCALE * fps_den // fps_num
        self.sps = self.pps = None
        self.sizes: list[int] = []       # per-sample byte sizes
        self.cts: list[int] = []         # composition times (ticks)
        self.sync: list[int] = []        # 1-based sync sample numbers
        self.mdat_pos = None             # offset of the mdat size field
        self.f.write(box(b"ftyp", b"isom" + struct.pack(">I", 0x200)
                         + b"isomiso2avc1mp41"))
        self.mdat_pos = self.f.tell()
        self.f.write(box(b"mdat", b""))  # size patched on close

    def add_frame(self, annexb: bytes, timecode_ms: int | None = None):
        """One access unit in decode order; timecode_ms is its
        display-order timestamp (mp4_set_eop's DTS/CTS split).

        CFR contract: stts is one run of n samples at the constant
        fps-derived delta, so the multiset of timecodes must be
        {k * fps_den/fps_num}. Reordered (B) display times are fine —
        ctts absorbs them — but genuinely variable frame durations
        would corrupt DTS; the encoder only produces CFR output."""
        payload = b""
        keyframe = False
        for nal in split_annexb(annexb):
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
        n = len(self.sizes)
        if timecode_ms is None:
            cts = n * self.delta
        else:
            cts = int(round(timecode_ms * TIMESCALE / 1000.0))
        self.sizes.append(len(payload))
        self.cts.append(cts)
        if keyframe:
            self.sync.append(n + 1)
        self.f.write(payload)

    # ------------------------------------------------------------------
    def _stbl(self, chunk_offset: int) -> bytes:
        n = len(self.sizes)
        avc1 = box(
            b"avc1",
            struct.pack(">6xH", 1)                    # data_ref_index
            + struct.pack(">HH12x", 0, 0)             # pre_defined/rsvd
            + struct.pack(">HH", self.w, self.h)
            + struct.pack(">II", 0x480000, 0x480000)  # 72 dpi
            + struct.pack(">I", 0)
            + struct.pack(">H", 1)                    # frame count
            + bytes(32)                               # compressor name
            + struct.pack(">Hh", 24, -1)              # depth, -1
            + box(b"avcC", avcc_private(self.sps, self.pps)))
        stsd = full_box(b"stsd", 0, 0, struct.pack(">I", 1) + avc1)
        stts = full_box(b"stts", 0, 0,
                        struct.pack(">I  II", 1, n, self.delta))
        stsc = full_box(b"stsc", 0, 0,
                        struct.pack(">I III", 1, 1, n, 1))
        stsz = full_box(b"stsz", 0, 0,
                        struct.pack(">II", 0, n)
                        + b"".join(struct.pack(">I", s)
                                   for s in self.sizes))
        stco = full_box(b"stco", 0, 0,
                        struct.pack(">II", 1, chunk_offset))
        out = stsd + stts + stsc + stsz + stco
        # composition offsets (decode vs display): only when reordered
        offs = [c - i * self.delta for i, c in enumerate(self.cts)]
        if any(offs):
            shift = min(offs)
            ctts = struct.pack(">I", n) + b"".join(
                struct.pack(">II", 1, o - shift) for o in offs)
            out += full_box(b"ctts", 0, 0, ctts)
        if self.sync and len(self.sync) != n:
            out += full_box(b"stss", 0, 0,
                            struct.pack(">I", len(self.sync))
                            + b"".join(struct.pack(">I", s)
                                       for s in self.sync))
        return box(b"stbl", out)

    def close(self):
        n = len(self.sizes)
        end = self.f.tell()
        if n:
            # patch the mdat size
            self.f.seek(self.mdat_pos)
            self.f.write(struct.pack(">I", end - self.mdat_pos))
            self.f.seek(end)
            dur = n * self.delta
            mvhd = full_box(
                b"mvhd", 0, 0,
                struct.pack(">II", 0, 0)
                + struct.pack(">II", TIMESCALE, dur)
                + struct.pack(">I", 0x00010000) + struct.pack(">H", 0x0100)
                + bytes(10)
                + struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0,
                              0x40000000)
                + bytes(24) + struct.pack(">I", 2))   # next track id
            tkhd = full_box(
                b"tkhd", 0, 7,
                struct.pack(">II", 0, 0) + struct.pack(">I", 1)
                + struct.pack(">I", 0) + struct.pack(">I", dur)
                + bytes(16)
                + struct.pack(">9i", 0x10000, 0, 0, 0, 0x10000, 0, 0, 0,
                              0x40000000)
                + struct.pack(">II", self.w << 16, self.h << 16))
            mdhd = full_box(b"mdhd", 0, 0,
                            struct.pack(">IIIIHH", 0, 0, TIMESCALE, dur,
                                        0x55C4, 0))   # 'und'
            hdlr = full_box(b"hdlr", 0, 0,
                            struct.pack(">I", 0) + b"vide" + bytes(12)
                            + b"pcamv-tpu\0")
            dinf = box(b"dinf", full_box(
                b"dref", 0, 0,
                struct.pack(">I", 1) + full_box(b"url ", 0, 1, b"")))
            vmhd = full_box(b"vmhd", 0, 1, bytes(8))
            mdat_data_start = self.mdat_pos + 8
            minf = box(b"minf", vmhd + dinf + self._stbl(mdat_data_start))
            mdia = box(b"mdia", mdhd + hdlr + minf)
            trak = box(b"trak", tkhd + mdia)
            self.f.write(box(b"moov", mvhd + trak))
        self.f.close()


# ---------------------------------------------------------------------------
# Verification-side parser (tests + --extract from .mp4): pull the AVC
# samples back out and rebuild an Annex-B stream.
# ---------------------------------------------------------------------------

def _boxes(data: bytes, start: int = 0, end: int | None = None):
    end = len(data) if end is None else end
    i = start
    while i + 8 <= end:
        size = struct.unpack(">I", data[i:i + 4])[0]
        kind = data[i + 4:i + 8]
        if size < 8:
            break
        yield kind, i + 8, i + size
        i += size


def _find(data, path, start=0, end=None):
    if not path:
        return start, len(data) if end is None else end
    for kind, s, e in _boxes(data, start, end):
        if kind == path[0]:
            if len(path) == 1:
                return s, e
            return _find(data, path[1:], s, e)
    raise KeyError(b"/".join(path).decode())


def demux_mp4(data: bytes) -> bytes:
    """MP4 -> Annex-B elementary stream (decode order), SPS/PPS from
    avcC re-emitted in front."""
    stbl_s, stbl_e = _find(data, [b"moov", b"trak", b"mdia", b"minf",
                                  b"stbl"])
    boxes = {k: (s, e) for k, s, e in _boxes(data, stbl_s, stbl_e)}
    s, e = boxes[b"stsz"]
    cnt = struct.unpack(">I", data[s + 8:s + 12])[0]
    sizes = [struct.unpack(">I", data[s + 12 + 4 * i:s + 16 + 4 * i])[0]
             for i in range(cnt)]
    s, _ = boxes[b"stco"]
    off = struct.unpack(">I", data[s + 8:s + 12])[0]
    # avcC: SPS/PPS
    stsd_s, stsd_e = _find(data, [b"stsd"], stbl_s, stbl_e)
    avc1_s, avc1_e = next((s2, e2) for k, s2, e2
                          in _boxes(data, stsd_s + 8, stsd_e)
                          if k == b"avc1")
    avcc_s, avcc_e = _find(data, [b"avcC"], avc1_s + 78, avc1_e)
    p = avcc_s + 6
    sps_len = struct.unpack(">H", data[p:p + 2])[0]
    sps = data[p + 2:p + 2 + sps_len]
    p = p + 2 + sps_len + 1
    pps_len = struct.unpack(">H", data[p:p + 2])[0]
    pps = data[p + 2:p + 2 + pps_len]
    out = b"\x00\x00\x00\x01" + sps + b"\x00\x00\x00\x01" + pps
    pos = off
    for sz in sizes:
        sample = data[pos:pos + sz]
        pos += sz
        i = 0
        while i + 4 <= len(sample):
            ln = struct.unpack(">I", sample[i:i + 4])[0]
            out += b"\x00\x00\x00\x01" + sample[i + 4:i + 4 + ln]
            i += 4 + ln
    return out
