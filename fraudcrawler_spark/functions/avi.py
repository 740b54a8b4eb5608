"""Pure-Python AVI (RIFF) codec for uncompressed 24-bit DIB video —
real frames, no external libraries.

Completes the multimodal triad (functions/bmp.py images, functions/wav.py
audio): the sandbox has no PyAV/ffmpeg, but the classic AVI container —
``RIFF('AVI ' LIST('hdrl' avih LIST('strl' strh strf)) LIST('movi'
'00db'×N) idx1)`` with uncompressed bottom-up BGR DIB frames — is simple
enough to implement exactly from the public format spec. The bytes in
the corpus videos table are genuine AVI files any player opens, and the
Spark kernels recover width/height/fps/frame pixels from the bytes
alone — metadata columns are never read on the decode path.

Frame packing reuses the BMP row convention (BGR, rows padded to 4
bytes, bottom-up) via numpy slicing — per-frame cost is O(pixels)
memcpy, the shape an Arrow-batched decode kernel needs.
"""

from __future__ import annotations

import struct

import numpy as np

_AVIH = struct.Struct("<4sI10I4I")  # 'avih', cksize, 10 dwords, 4 reserved
_STRH = struct.Struct("<4sI4s4sIHHIIIIIIII4h")
_STRF = struct.Struct("<4sIIiiHHIIiiII")  # 'strf', cksize, BITMAPINFOHEADER


def _dib_pack(frame: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB → bottom-up BGR rows padded to 4 bytes."""
    h, w = frame.shape[:2]
    row_bytes = w * 3
    stride = row_bytes + ((-row_bytes) % 4)
    bgr = frame[::-1, :, ::-1].astype(np.uint8)
    rows = np.zeros((h, stride), dtype=np.uint8)
    rows[:, :row_bytes] = bgr.reshape(h, row_bytes)
    return rows.tobytes()


def _dib_unpack(data: bytes, w: int, h: int) -> np.ndarray:
    row_bytes = w * 3
    stride = row_bytes + ((-row_bytes) % 4)
    if len(data) < stride * h:
        raise ValueError("truncated DIB frame")
    rows = np.frombuffer(data[: stride * h], dtype=np.uint8).reshape(h, stride)
    bgr = rows[:, :row_bytes].reshape(h, w, 3)
    return bgr[::-1, :, ::-1]


def avi_encode(frames: list[np.ndarray], fps: int) -> bytes:
    """List of (h, w, 3) uint8 RGB frames → uncompressed 24-bit AVI bytes
    (one 'vids'/DIB stream, keyframe-only idx1 index)."""
    if not frames:
        raise ValueError("at least one frame required")
    h, w = frames[0].shape[:2]
    for f in frames:
        if f.shape != frames[0].shape or f.ndim != 3 or f.shape[2] != 3:
            raise ValueError("all frames must be identical (h, w, 3) arrays")
    stride = (w * 3 + 3) // 4 * 4
    frame_bytes = stride * h
    n = len(frames)

    avih = _AVIH.pack(
        b"avih", 56,
        1_000_000 // fps,            # dwMicroSecPerFrame
        frame_bytes * fps,           # dwMaxBytesPerSec
        0,                           # dwPaddingGranularity
        0x10,                        # dwFlags: AVIF_HASINDEX
        n, 0, 1,                     # total frames, initial frames, streams
        frame_bytes,                 # dwSuggestedBufferSize
        w, h, 0, 0, 0, 0,
    )
    strh = _STRH.pack(
        b"strh", 56, b"vids", b"DIB ",
        0, 0, 0, 0,                  # flags, priority, language, initial
        1, fps,                      # dwScale, dwRate → fps = rate/scale
        0, n,                        # dwStart, dwLength
        frame_bytes, 0xFFFFFFFF, 0,  # bufsize, quality (-1), sample size
        0, 0, w, h,                  # rcFrame
    )
    strf = _STRF.pack(
        b"strf", 40, 40, w, h, 1, 24, 0, frame_bytes, 2835, 2835, 0, 0
    )
    strl = b"LIST" + struct.pack("<I", 4 + len(strh) + len(strf)) + b"strl" + strh + strf
    hdrl = b"LIST" + struct.pack("<I", 4 + len(avih) + len(strl)) + b"hdrl" + avih + strl

    movi_body = b"".join(
        b"00db" + struct.pack("<I", frame_bytes) + _dib_pack(f) for f in frames
    )
    movi = b"LIST" + struct.pack("<I", 4 + len(movi_body)) + b"movi" + movi_body

    # idx1 offsets are from the start of the 'movi' fourcc (offset 4
    # inside the LIST body — the convention players expect)
    idx_entries = []
    off = 4
    for _ in range(n):
        idx_entries.append(struct.pack("<4sIII", b"00db", 0x10, off, frame_bytes))
        off += 8 + frame_bytes
    idx1 = b"idx1" + struct.pack("<I", 16 * n) + b"".join(idx_entries)

    body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(body)) + body


def avi_decode(data: bytes) -> tuple[float, list[np.ndarray]]:
    """Uncompressed 24-bit DIB AVI bytes → (fps, list of (h, w, 3) uint8
    RGB frames).

    Walks the RIFF chunk tree (tolerating unknown chunks/LISTs real
    muxers emit) and raises ValueError on anything that is not a single
    uncompressed 24-bit 'vids' stream — the caller decides whether a
    non-AVI payload is an error or a fallback case.
    """
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not an AVI payload")
    w = h = None
    scale = rate = None
    frames: list[np.ndarray] = []

    def walk(lo: int, hi: int) -> None:
        nonlocal w, h, scale, rate
        pos = lo
        while pos + 8 <= hi:
            cid, size = struct.unpack_from("<4sI", data, pos)
            body_lo, body_hi = pos + 8, min(pos + 8 + size, hi)
            if cid == b"LIST":
                walk(body_lo + 4, body_hi)  # skip the list-type fourcc
            elif cid == b"strh":
                # fccType@0 … dwScale@20, dwRate@24 (public strh layout)
                if data[body_lo:body_lo + 4] == b"vids":
                    scale, rate = struct.unpack_from("<II", data, body_lo + 20)
            elif cid == b"strf" and w is None:
                _, bw, bh, _, bpp, comp = struct.unpack_from(
                    "<IiiHHI", data, body_lo
                )
                if bpp != 24 or comp != 0:
                    raise ValueError(
                        f"unsupported AVI: bpp={bpp} compression={comp}"
                    )
                w, h = bw, abs(bh)
            elif cid in (b"00db", b"00dc"):
                if w is None:
                    raise ValueError("frame chunk before stream format")
                frames.append(_dib_unpack(data[body_lo:body_hi], w, h))
            pos += 8 + size + (size & 1)  # RIFF chunks are word-aligned

    walk(12, 8 + struct.unpack_from("<I", data, 4)[0])
    if w is None or scale is None or not frames:
        raise ValueError("missing stream header or frames")
    return rate / scale, frames
