"""Pure-numpy media codecs: PCM16 WAV, 24-bit BMP, uncompressed AVI.

No media libraries ship in this container, but these three formats
are fully decodable with numpy alone — which makes the multimodal
decode stages (data/multimodal.py) real, tested kernels for image,
audio AND video (RIFF 'AVI ' with DIB frames — the uncompressed
container every real toolchain can also emit).
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


# ---------------------------------------------------------------------------
# Uncompressed AVI (RIFF 'AVI ' + DIB '00db' frames) — the pure-numpy
# video container: 24-bit BI_RGB frames, bottom-up BGR rows, 4-byte
# stride padding (the same DIB layout as the BMP codec above). This
# upgrades the video decode stage from a stub to a real, tested kernel.
# ---------------------------------------------------------------------------

def _u32(x):
    return np.uint32(x).tobytes()


def _i32(x):
    return np.int32(x).tobytes()


def _u16(x):
    return np.uint16(x).tobytes()


def encode_avi(frames: np.ndarray, fps: int = 4) -> bytes:
    """N×H×W×3 uint8 RGB frames → uncompressed RIFF AVI ('DIB '
    handler, one '00db' chunk per frame, idx1 index)."""
    frames = np.asarray(frames, dtype=np.uint8)
    n, h, w, c = frames.shape
    assert c == 3
    row = w * 3
    pad = (4 - row % 4) % 4
    stride = row + pad
    frame_size = stride * h

    bodies = []
    for f in frames:
        bgr = f[::-1, :, ::-1]  # bottom-up rows, BGR channels
        buf = np.zeros((h, stride), dtype=np.uint8)
        buf[:, :row] = bgr.reshape(h, row)
        bodies.append(buf.tobytes())

    strf = (_u32(40) + _i32(w) + _i32(h) + _u16(1) + _u16(24) + _u32(0)
            + _u32(frame_size) + _i32(0) + _i32(0) + _u32(0) + _u32(0))
    strh = (b"vids" + b"DIB " + _u32(0) + _u16(0) + _u16(0) + _u32(0)
            + _u32(1) + _u32(fps) + _u32(0) + _u32(n) + _u32(frame_size)
            + _u32(0xFFFFFFFF) + _u32(0) + _u16(0) * 4)
    strl = (b"strh" + _u32(len(strh)) + strh
            + b"strf" + _u32(len(strf)) + strf)
    avih = (_u32(1_000_000 // fps) + _u32(frame_size * fps) + _u32(0)
            + _u32(0x10) + _u32(n) + _u32(0) + _u32(1) + _u32(frame_size)
            + _u32(w) + _u32(h) + _u32(0) * 4)
    hdrl = (b"avih" + _u32(len(avih)) + avih
            + b"LIST" + _u32(4 + len(strl)) + b"strl" + strl)

    movi_chunks = b"".join(b"00db" + _u32(len(b)) + b for b in bodies)
    idx_entries = []
    off = 4
    for b in bodies:
        idx_entries.append(b"00db" + _u32(0x10) + _u32(off)
                           + _u32(len(b)))
        off += 8 + len(b)
    idx1 = b"".join(idx_entries)

    body = (b"LIST" + _u32(4 + len(hdrl)) + b"hdrl" + hdrl
            + b"LIST" + _u32(4 + len(movi_chunks)) + b"movi" + movi_chunks
            + b"idx1" + _u32(len(idx1)) + idx1)
    return b"RIFF" + _u32(4 + len(body)) + b"AVI " + body


def decode_avi(payload: bytes) -> tuple[np.ndarray, int]:
    """Uncompressed RIFF AVI → (N×H×W×3 uint8 RGB frames, fps).
    Generic RIFF walk (explicit stack over LIST nesting); only 24-bit
    BI_RGB '00db'/'00dc' frames are supported."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"AVI ":
        raise ValueError("not a RIFF/AVI payload")

    def rd32(o):
        return int(np.frombuffer(payload, "<u4", count=1, offset=o)[0])

    w = h = None
    scale, rate = 1, 4
    cur_stream = None  # fccType of the most recent strh (strl lists
    bodies = []        # are walked contiguously, so this pairs each
    stack = [(12, len(payload))]  # strf with ITS stream)
    while stack:
        p, end = stack.pop()
        while p + 8 <= end:
            fcc = payload[p:p + 4]
            sz = rd32(p + 4)
            if fcc == b"LIST":
                stack.append((p + 12, p + 8 + sz))
            elif fcc == b"avih":
                w, h = rd32(p + 8 + 32), rd32(p + 8 + 36)
            elif fcc == b"strh":
                cur_stream = payload[p + 8:p + 12]
                if cur_stream == b"vids":
                    scale = rd32(p + 8 + 20) or 1
                    rate = rd32(p + 8 + 24) or 4
            elif fcc == b"strf" and cur_stream == b"vids":
                # an audio stream's strf is a WAVEFORMATEX — only the
                # video stream's BITMAPINFOHEADER is validated
                bpp = int(np.frombuffer(payload, "<u2", count=1,
                                        offset=p + 8 + 14)[0])
                comp = rd32(p + 8 + 16)
                if bpp != 24 or comp != 0:
                    raise ValueError(
                        f"only 24-bit BI_RGB AVI supported "
                        f"(bpp={bpp}, compression={comp})")
            elif fcc in (b"00db", b"00dc"):
                bodies.append(payload[p + 8:p + 8 + sz])
            p += 8 + sz + (sz & 1)
    if w is None:
        raise ValueError("no avih header found")
    row = w * 3
    stride = row + (4 - row % 4) % 4
    frames = []
    for b in bodies:
        buf = np.frombuffer(b, dtype=np.uint8,
                            count=h * stride).reshape(h, stride)
        bgr = buf[:, :row].reshape(h, w, 3)[::-1]
        frames.append(bgr[:, :, ::-1])
    return (np.stack(frames) if frames
            else np.empty((0, h, w, 3), np.uint8)), rate // scale
