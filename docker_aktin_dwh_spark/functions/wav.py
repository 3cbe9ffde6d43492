"""Pure-stdlib WAV (RIFF PCM) codec — the real audio-decode path for
the multimodal operators, companion to functions/png.py (which closed
the image modality in r6).  No external audio libraries exist in the
container; WAV PCM needs none: the container format is length-prefixed
RIFF chunks and the samples are raw little-endian PCM.

Scope: integer PCM (format tag 1), 8-bit unsigned and 16-bit signed,
any channel count, arbitrary extra chunks (LIST/INFO etc.) skipped by
a proper chunk walk.  Everything else — float PCM, extensible format,
24-bit — raises NotImplementedError loudly rather than mis-decoding.

Like the PNG codec this is a per-payload Python codec by design: it
runs inside Arrow-batched mapInPandas partitions
(operators/multimodal.py) where per-payload byte parsing is genuine
codec work — the sanctioned use of the Python lane.

Reference analogue: opaque blob payloads in the document volume
(reference: src/docker/template.yml:51) generalized to typed binary
media columns.
"""

from __future__ import annotations

import struct


def encode_wav(samples: list[int], sample_rate: int, channels: int = 1,
               sampwidth: int = 2, extra_chunk: bytes | None = None) -> bytes:
    """Encode interleaved signed samples (range [-128,127] for 8-bit,
    [-32768,32767] for 16-bit) as a RIFF/WAVE PCM payload.

    ``extra_chunk``, when given, is inserted as a LIST chunk between
    fmt and data so tests can prove the decoder walks chunks instead of
    assuming a fixed 44-byte header layout (real-world WAVs carry
    INFO/metadata chunks there).
    """
    if sampwidth not in (1, 2):
        raise NotImplementedError(f"sampwidth={sampwidth} unsupported")
    if len(samples) % channels:
        raise ValueError("sample count not a multiple of channels")
    if sampwidth == 1:
        data = bytes((s + 128) & 0xFF for s in samples)
    else:
        data = struct.pack(f"<{len(samples)}h", *samples)
    block_align = channels * sampwidth
    fmt = struct.pack("<HHIIHH", 1, channels, sample_rate,
                      sample_rate * block_align, block_align,
                      sampwidth * 8)
    chunks = b"".join((
        b"fmt " + struct.pack("<I", len(fmt)) + fmt,
        (b"LIST" + struct.pack("<I", len(extra_chunk)) + extra_chunk
         + (b"\x00" if len(extra_chunk) % 2 else b"")
         if extra_chunk is not None else b""),
        b"data" + struct.pack("<I", len(data)) + data
        + (b"\x00" if len(data) % 2 else b""),
    ))
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def decode_wav(payload: bytes) -> tuple[int, int, int, list[int]]:
    """Decode a RIFF/WAVE PCM payload → (sample_rate, channels,
    sampwidth, interleaved signed samples).  Walks the chunk list
    (skipping unknown chunks, honoring odd-length padding), so headers
    with LIST/INFO metadata decode the same as minimal ones."""
    if len(payload) < 12 or payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    pos, end = 12, 8 + struct.unpack("<I", payload[4:8])[0]
    end = min(end, len(payload))
    fmt = None
    data = None
    while pos + 8 <= end:
        cid = payload[pos:pos + 4]
        (clen,) = struct.unpack("<I", payload[pos + 4:pos + 8])
        body = payload[pos + 8:pos + 8 + clen]
        if len(body) < clen:
            raise ValueError(f"truncated {cid!r} chunk")
        if cid == b"fmt ":
            if clen < 16:
                raise ValueError("fmt chunk too short")
            fmt = struct.unpack("<HHIIHH", body[:16])
        elif cid == b"data":
            data = body
        pos += 8 + clen + (clen & 1)      # chunks are word-aligned
    if fmt is None or data is None:
        raise ValueError("missing fmt or data chunk")
    tag, channels, rate, _byterate, _align, bits = fmt
    if tag != 1:
        raise NotImplementedError(f"non-PCM format tag {tag}")
    if rate <= 0 or channels <= 0:
        # reject at decode time: pcm_stats divides by both, and a
        # zero here is always a malformed header, never real audio
        raise ValueError(f"invalid fmt: rate={rate} channels={channels}")
    if bits == 8:
        samples = [b - 128 for b in data]
        width = 1
    elif bits == 16:
        samples = list(struct.unpack(f"<{len(data) // 2}h",
                                     data[:len(data) - (len(data) % 2)]))
        width = 2
    else:
        raise NotImplementedError(f"{bits}-bit PCM unsupported")
    return rate, channels, width, samples


def pcm_stats(rate: int, channels: int, samples: list[int]
              ) -> tuple[int, float, float, float]:
    """(n_frames, duration_sec, mean, rms) over all interleaved
    samples — the per-clip features an audio-curation pipeline gates
    on (silence/clipping detection, length bucketing)."""
    n_frames = len(samples) // channels
    n = len(samples)
    mean = sum(samples) / n if n else 0.0
    rms = (sum(s * s for s in samples) / n) ** 0.5 if n else 0.0
    return n_frames, n_frames / rate, mean, rms
