"""Generate the committed media_pipeline expectation
(tests/data/media_pipeline_expected.parquet) with an INDEPENDENT
implementation of the resize → decode → feature chain.

Independence from graphscope_ray/data/multimodal.py + codecs.py:
- BMP parsing here is struct-based (no shared decode code); the
  nearest-neighbor resample reads source pixels straight out of the
  original payload bytes (the engine re-encodes to BMP and re-decodes —
  lossless for uint8, so grayscale of the resized pixels must agree).
- WAV parsing walks the RIFF header with struct.unpack.
- np.resize's cycle/truncate semantics are re-implemented with a plain
  index loop.
The INPUT payloads come from multimodal.synth_media (shared fixture —
that is the data, not the system under test). Video rows use the
declared stub (blake2b digest), shared by definition.

Run from the repo root:  python tools/gen_media_oracle.py
The media_pipeline oracle_sql() entry reads the parquet this writes.
"""
import hashlib
import struct
import sys

import numpy as np
import pandas as pd

sys.path.insert(0, ".")

N, SEED, OUT_W, OUT_H, FEAT_DIM = 96, 5, 8, 8, 8


def bmp_gray_resized(payload: bytes, out_w: int, out_h: int):
    """Grayscale (mean RGB) of the nearest-neighbor-resized BMP,
    parsed with struct only. Returns (gray floats row-major, resized
    BMP byte size)."""
    assert payload[:2] == b"BM"
    data_off = struct.unpack_from("<I", payload, 10)[0]
    w = struct.unpack_from("<i", payload, 18)[0]
    h = struct.unpack_from("<i", payload, 22)[0]
    bpp = struct.unpack_from("<H", payload, 28)[0]
    assert bpp == 24
    stride = (w * 3 + 3) // 4 * 4
    rows = [(r * h) // out_h for r in range(out_h)]
    cols = [(c * w) // out_w for c in range(out_w)]
    gray = []
    for r in rows:
        # bottom-up storage: display row r lives at file row (h-1-r)
        base = data_off + (h - 1 - r) * stride
        for c in cols:
            o = base + c * 3
            b, g, rr = payload[o], payload[o + 1], payload[o + 2]
            gray.append((float(rr) + float(g) + float(b)) / 3.0)
    out_stride = (out_w * 3 + 3) // 4 * 4
    resized_bytes = 54 + out_stride * out_h
    return gray, resized_bytes


def wav_abs_samples(payload: bytes):
    assert payload[:4] == b"RIFF" and payload[8:12] == b"WAVE"
    pos = payload.find(b"data")
    n = struct.unpack_from("<I", payload, pos + 4)[0]
    body = payload[pos + 8: pos + 8 + n]
    out = []
    for i in range(0, len(body), 2):
        (s,) = struct.unpack_from("<h", body, i)
        out.append(abs(float(s)) / 32767.0 * 255.0)
    return out


def np_resize_like(vals, k):
    if not vals:
        return [0.0] * k  # np.resize of an empty array zero-fills
    return [vals[i % len(vals)] for i in range(k)]


def main():
    from graphscope_ray.data.multimodal import synth_media
    from graphscope_ray.util import round_half_away

    t = synth_media(n=N, seed=SEED)
    rows = []
    for mid, kind, payload in zip(t["media_id"].to_pylist(),
                                  t["kind"].to_pylist(),
                                  t["payload"].to_pylist()):
        if kind == "image":
            raw, nbytes = bmp_gray_resized(payload, OUT_W, OUT_H)
        elif kind == "audio":
            raw, nbytes = wav_abs_samples(payload), len(payload)
        else:  # video: declared stub — blake2b digest bytes
            d = hashlib.blake2b(payload, digest_size=16).digest()
            raw, nbytes = [float(b) for b in d], len(payload)
        feat = [v / 255.0 for v in np_resize_like(raw, FEAT_DIM)]
        for dim, f in enumerate(feat):
            rows.append((mid, kind, nbytes, dim,
                         float(round_half_away(np.float64(f), 6))))
    df = pd.DataFrame(rows, columns=["media_id", "kind", "payload_bytes",
                                     "dim", "feat"])
    out = "tests/data/media_pipeline_expected.parquet"
    import os
    os.makedirs("tests/data", exist_ok=True)
    df.to_parquet(out, index=False)
    print(f"wrote {out}: {len(df)} rows "
          f"({df['kind'].value_counts().to_dict()})")


if __name__ == "__main__":
    main()
