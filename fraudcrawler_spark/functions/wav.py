"""Pure-Python RIFF/WAVE PCM16 codec — real audio bytes, no external libs.

Companion to functions/bmp.py: the sandbox has no soundfile/ffmpeg, but the
canonical WAV container (RIFF header + ``fmt `` chunk + ``data`` chunk of
little-endian signed 16-bit PCM) is simple enough to implement exactly from
the public format spec. The bytes in the corpus audio table are genuine WAV
files any player opens, and the Spark kernels recover sample rate, channel
count, and every sample value from the bytes alone — metadata columns are
never read on the decode path.

Encode/decode are numpy-vectorized (``np.frombuffer``/``tobytes`` over the
int16 sample block, no per-sample Python) — per-clip cost is O(samples)
memcpy, the shape an Arrow-batched decode kernel needs.
"""

from __future__ import annotations

import struct

import numpy as np

_RIFF_HDR = struct.Struct("<4sI4s")  # 'RIFF', chunk size, 'WAVE'
_FMT_CHUNK = struct.Struct("<4sIHHIIHH")  # 'fmt ', 16, fmt, ch, sr, br, ba, bits
_DATA_HDR = struct.Struct("<4sI")  # 'data', byte length


def wav_encode(samples: np.ndarray, sample_rate: int) -> bytes:
    """1-D int16 sample array → mono PCM16 WAV bytes."""
    if samples.ndim != 1:
        raise ValueError(f"expected 1-D sample array, got shape {samples.shape}")
    pcm = samples.astype("<i2").tobytes()
    fmt = _FMT_CHUNK.pack(
        b"fmt ", 16, 1, 1, sample_rate, sample_rate * 2, 2, 16
    )
    data_hdr = _DATA_HDR.pack(b"data", len(pcm))
    riff_size = 4 + len(fmt) + len(data_hdr) + len(pcm)
    return _RIFF_HDR.pack(b"RIFF", riff_size, b"WAVE") + fmt + data_hdr + pcm


def wav_decode(data: bytes) -> tuple[int, np.ndarray]:
    """Mono PCM16 WAV bytes → (sample_rate, 1-D int16 array).

    Walks the RIFF chunk list (tolerating extra chunks like LIST/INFO that
    real encoders emit) and raises ValueError on anything that is not
    uncompressed 16-bit mono PCM — the caller decides whether a non-WAV
    payload is an error or a fallback case.
    """
    if len(data) < _RIFF_HDR.size or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a WAV payload")
    pos = _RIFF_HDR.size
    sample_rate: int | None = None
    pcm: bytes | None = None
    while pos + 8 <= len(data):
        cid, size = struct.unpack_from("<4sI", data, pos)
        body = data[pos + 8 : pos + 8 + size]
        # a chunk whose declared size overruns the payload is truncation —
        # raise like avi.py's _dib_unpack does, never return fewer samples
        # silently (ADVICE r4)
        if len(body) < size and cid in (b"fmt ", b"data"):
            raise ValueError(
                f"truncated {cid.decode('ascii', 'replace').strip()} chunk: "
                f"declared {size} bytes, {len(body)} present"
            )
        if cid == b"fmt ":
            if size < 16:
                raise ValueError("truncated fmt chunk")
            audio_fmt, channels, sr, _br, _ba, bits = struct.unpack_from(
                "<HHIIHH", body, 0
            )
            if audio_fmt != 1 or channels != 1 or bits != 16:
                raise ValueError(
                    f"unsupported WAV: fmt={audio_fmt} ch={channels} bits={bits}"
                )
            sample_rate = sr
        elif cid == b"data":
            if size & 1:
                raise ValueError(
                    f"odd data chunk size {size} is invalid for 16-bit PCM"
                )
            pcm = body
        pos += 8 + size + (size & 1)  # RIFF chunks are word-aligned
    if sample_rate is None or pcm is None:
        raise ValueError("missing fmt or data chunk")
    return sample_rate, np.frombuffer(pcm, dtype="<i2")
