"""Pure-numpy media codecs: PCM16 WAV and 24-bit BMP.

No image/audio libraries ship in this container, but these two
formats are fully decodable with numpy alone — which turns the
multimodal decode stage (data/multimodal.py) from a stub into a real,
tested kernel for image + audio. (Video remains honestly stubbed: no
pure-numpy video container exists.)
"""

from __future__ import annotations

import numpy as np


def encode_wav(samples: np.ndarray, rate: int = 16_000) -> bytes:
    """Mono PCM16 WAV (canonical 44-byte header)."""
    pcm = np.asarray(samples)
    if pcm.dtype != np.int16:
        pcm = np.clip(pcm, -1.0, 1.0)
        pcm = (pcm * 32767.0).astype("<i2")
    else:
        pcm = pcm.astype("<i2", copy=False)
    data = pcm.tobytes()
    n = len(data)

    def u32(x):
        return np.uint32(x).tobytes()

    def u16(x):
        return np.uint16(x).tobytes()

    hdr = (b"RIFF" + u32(36 + n) + b"WAVE"
           + b"fmt " + u32(16) + u16(1) + u16(1) + u32(rate)
           + u32(rate * 2) + u16(2) + u16(16)
           + b"data" + u32(n))
    return hdr + data


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """→ (int16 samples, sample rate). Minimal RIFF walk (PCM16 mono)."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError("not a RIFF/WAVE payload")
    rate = int(np.frombuffer(payload, dtype="<u4", count=1, offset=24)[0])
    pos = payload.find(b"data")
    if pos < 0:
        raise ValueError("no data chunk")
    n = int(np.frombuffer(payload, dtype="<u4", count=1, offset=pos + 4)[0])
    body = payload[pos + 8: pos + 8 + n]
    return np.frombuffer(body, dtype="<i2"), rate


def encode_bmp(rgb: np.ndarray) -> bytes:
    """H×W×3 uint8 (RGB) → 24-bit uncompressed BMP (bottom-up, BGR,
    4-byte row padding)."""
    rgb = np.asarray(rgb, dtype=np.uint8)
    h, w, c = rgb.shape
    assert c == 3
    row = w * 3
    pad = (4 - row % 4) % 4
    bgr = rgb[::-1, :, ::-1]  # bottom-up rows, BGR channels
    body = np.zeros((h, row + pad), dtype=np.uint8)
    body[:, :row] = bgr.reshape(h, row)
    data = body.tobytes()

    def u32(x):
        return np.uint32(x).tobytes()

    def i32(x):
        return np.int32(x).tobytes()

    def u16(x):
        return np.uint16(x).tobytes()

    file_hdr = b"BM" + u32(14 + 40 + len(data)) + u16(0) + u16(0) + u32(54)
    info_hdr = (u32(40) + i32(w) + i32(h) + u16(1) + u16(24) + u32(0)
                + u32(len(data)) + i32(2835) + i32(2835) + u32(0) + u32(0))
    return file_hdr + info_hdr + data


def decode_bmp(payload: bytes) -> np.ndarray:
    """24-bit uncompressed BMP → H×W×3 uint8 RGB."""
    if payload[:2] != b"BM":
        raise ValueError("not a BMP payload")
    off = int(np.frombuffer(payload, dtype="<u4", count=1, offset=10)[0])
    w = int(np.frombuffer(payload, dtype="<i4", count=1, offset=18)[0])
    h = int(np.frombuffer(payload, dtype="<i4", count=1, offset=22)[0])
    bpp = int(np.frombuffer(payload, dtype="<u2", count=1, offset=28)[0])
    if bpp != 24:
        raise ValueError(f"only 24-bit BMP supported, got {bpp}")
    row = w * 3
    stride = row + (4 - row % 4) % 4
    body = np.frombuffer(payload, dtype=np.uint8, count=abs(h) * stride,
                         offset=off).reshape(abs(h), stride)
    bgr = body[:, :row].reshape(abs(h), w, 3)
    if h > 0:
        bgr = bgr[::-1]
    return bgr[:, :, ::-1].copy()
