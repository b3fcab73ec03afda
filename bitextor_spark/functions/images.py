"""Image payload codecs + per-row verification (BASELINE.json input_hint).

The input table carries real encoded image bytes (``fmt`` ∈ {png, jpeg}).
This container ships no image libraries (no PIL/libjpeg), so:

- ``png`` is a REAL codec: a pure-stdlib PNG encoder/decoder (zlib inflate/
  deflate, filter type 0, 8-bit RGB, non-interlaced) — bytes are valid PNG
  files any external tool can open. Lossless → exact-pixel verification.
- ``jpeg`` is a DETERMINISTIC FAKE standing in for a lossy codec: pixels are
  quantized to 6 bits/channel (the "loss") and wrapped in the same PNG
  container with a ``QJPG`` marker chunk. The Spark-side plumbing (binary
  column, batch decode in pandas UDFs, PSNR≥40dB gate) is real and tested;
  swapping in libjpeg on a real cluster changes only `_encode_lossy`/
  `_decode`. PSNR for 6-bit quantization ≈ 20·log10(255/(4/√12)) ≈ 46.9 dB,
  comfortably above the 40 dB gate.

Per-row invariant (vectorized over Arrow batches, never per-row Python at
the plan level): decode(bytes) vs the regenerated reference pixels —
exact for png, PSNR ≥ 40 dB for jpeg — plus caption exact equality.
"""

from __future__ import annotations

import hashlib
import struct
import zlib

import numpy as np

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def png_encode(pixels: np.ndarray, extra_chunks: list[tuple[bytes, bytes]] | None = None) -> bytes:
    """RGB8 (h, w, 3) → PNG bytes (filter 0, no interlace)."""
    h, w, c = pixels.shape
    assert c == 3 and pixels.dtype == np.uint8
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    raw = np.concatenate(
        [np.zeros((h, 1), dtype=np.uint8), pixels.reshape(h, w * 3)], axis=1
    ).tobytes()
    out = [_PNG_SIG, _chunk(b"IHDR", ihdr)]
    for tag, payload in extra_chunks or []:
        out.append(_chunk(tag, payload))
    out.append(_chunk(b"IDAT", zlib.compress(raw, 6)))
    out.append(_chunk(b"IEND", b""))
    return b"".join(out)


def png_decode(data: bytes) -> tuple[np.ndarray, dict[bytes, bytes]]:
    """PNG bytes → ((h, w, 3) uint8, ancillary chunks). Filter types 0-2."""
    assert data[:8] == _PNG_SIG, "not a PNG"
    pos, w = 8, None
    idat, extra = [], {}
    while pos < len(data):
        (ln,) = struct.unpack(">I", data[pos: pos + 4])
        tag = data[pos + 4: pos + 8]
        payload = data[pos + 8: pos + 8 + ln]
        pos += 12 + ln
        if tag == b"IHDR":
            w, h, depth, ctype, _, _, interlace = struct.unpack(">IIBBBBB", payload)
            assert depth == 8 and ctype == 2 and interlace == 0
        elif tag == b"IDAT":
            idat.append(payload)
        elif tag == b"IEND":
            break
        else:
            extra[tag] = payload
    raw = zlib.decompress(b"".join(idat))
    stride = w * 3
    rows = np.frombuffer(raw, dtype=np.uint8).reshape(h, stride + 1)
    filters, body = rows[:, 0], rows[:, 1:].astype(np.int16)
    out = np.zeros((h, stride), dtype=np.uint8)
    for y in range(h):
        line = body[y]
        f = filters[y]
        if f == 0:
            out[y] = line.astype(np.uint8)
        elif f == 1:  # Sub
            cur = line.copy()
            for x in range(3, stride):
                cur[x] = (cur[x] + cur[x - 3]) & 0xFF
            out[y] = cur.astype(np.uint8)
        elif f == 2:  # Up
            out[y] = ((line + out[y - 1]) & 0xFF).astype(np.uint8)
        else:
            raise ValueError(f"unsupported PNG filter {f}")
    return out.reshape(h, w, 3), extra


QJPG_TAG = b"qJPG"  # ancillary marker chunk for the fake-lossy container


def encode_image(pixels: np.ndarray, fmt: str) -> bytes:
    if fmt == "png":
        return png_encode(pixels)
    if fmt == "jpeg":
        quant = ((pixels & 0xFC) | 0x02).astype(np.uint8)  # 6-bit + mid-step
        return png_encode(quant, extra_chunks=[(QJPG_TAG, b"v1")])
    raise ValueError(f"unknown fmt {fmt}")


def decode_image(data: bytes) -> np.ndarray:
    pixels, _extra = png_decode(data)
    return pixels


def psnr_db(a: np.ndarray, b: np.ndarray) -> float:
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    if mse == 0:
        return float("inf")
    return float(20 * np.log10(255.0) - 10 * np.log10(mse))


def phash64(pixels: np.ndarray) -> int:
    """Perceptual-hash-like 64-bit value: 8×8 block-mean grayscale
    thresholded at its own mean (aHash), returned as signed int64."""
    gray = pixels.astype(np.float64).mean(axis=2)
    h, w = gray.shape
    ys = np.linspace(0, h, 9).astype(int)
    xs = np.linspace(0, w, 9).astype(int)
    blocks = np.empty((8, 8))
    for i in range(8):
        for j in range(8):
            blocks[i, j] = gray[ys[i]: ys[i + 1], xs[j]: xs[j + 1]].mean()
    bits = (blocks > blocks.mean()).flatten()
    val = 0
    for i, b in enumerate(bits):
        if b:
            val |= 1 << i
    return val - (1 << 64) if val >= (1 << 63) else val


# ---------------------------------------------------------------------------
# Deterministic reference generator (FIXTURES.md §1) — the "ground truth"
# the verifier regenerates per row.
# ---------------------------------------------------------------------------

def _seed64(image_id: str, salt: int) -> int:
    return int.from_bytes(
        hashlib.md5(f"{salt}:{image_id}".encode()).digest()[:8], "big"
    )


def reference_pixels(image_id: str, w: int, h: int, salt: int = 42) -> np.ndarray:
    """Seeded smooth gradient + structured noise keyed by image_id."""
    rng = np.random.Generator(np.random.PCG64(_seed64(image_id, salt)))
    yy, xx = np.mgrid[0:h, 0:w]
    base = np.stack(
        [
            (xx * 255 / max(w - 1, 1)),
            (yy * 255 / max(h - 1, 1)),
            ((xx + yy) * 255 / max(w + h - 2, 1)),
        ],
        axis=2,
    )
    noise = rng.integers(0, 64, size=(h, w, 3))
    return np.clip(base * 0.75 + noise, 0, 255).astype(np.uint8)


def reference_caption(image_id: str, salt: int = 42) -> str:
    tag = hashlib.md5(f"cap:{salt}:{image_id}".encode()).hexdigest()[:12]
    return f"Caption for {image_id} — ünïcodé ✓ {tag}"


def make_image_row(image_id: str, salt: int = 42) -> dict:
    """One row of the images table (image_id, bytes, w, h, fmt, caption,
    phash), fully determined by (image_id, salt)."""
    s = _seed64(image_id, salt)
    w = 16 + (s % 49)
    h = 16 + ((s >> 8) % 49)
    fmt = "jpeg" if (s >> 16) % 2 else "png"
    pixels = reference_pixels(image_id, w, h, salt)
    return {
        "image_id": image_id,
        "bytes": encode_image(pixels, fmt),
        "w": int(w),
        "h": int(h),
        "fmt": fmt,
        "caption": reference_caption(image_id, salt),
        "phash": phash64(pixels),
    }


def verify_image_batch(
    image_ids, blobs, fmts, captions, salt: int = 42, psnr_threshold: float = 40.0
) -> tuple[list[bool], list[bool]]:
    """Vectorized-per-batch verification: decode each blob, compare against
    the regenerated reference (exact for png, PSNR≥threshold for jpeg), and
    check caption equality. Called from pandas UDF batches."""
    bytes_ok, caption_ok = [], []
    for iid, blob, fmt, cap in zip(image_ids, blobs, fmts, captions):
        if iid is None or blob is None:
            bytes_ok.append(False)
            caption_ok.append(False)
            continue
        try:
            decoded = decode_image(bytes(blob))
            ref = reference_pixels(iid, decoded.shape[1], decoded.shape[0], salt)
            if fmt == "png":
                ok = bool(np.array_equal(decoded, ref))
            else:
                ok = psnr_db(decoded, ref) >= psnr_threshold
        except Exception:
            ok = False
        bytes_ok.append(ok)
        caption_ok.append(cap == reference_caption(iid, salt))
    return bytes_ok, caption_ok
