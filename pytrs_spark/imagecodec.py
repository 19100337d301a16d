"""Deterministic image codec used for the raster<->vector tile stage.

The container has no image libraries (no PIL / libjpeg), so real
PNG/JPEG decode is STUBBED: :func:`decode_real` raises
``NotImplementedError`` with instructions.  Everything else -- the
Spark-side plumbing (binary columns, Arrow batch shapes, grouped-map
signatures), the pixel math (regrid, PSNR), and the container format
-- is real and tested.

Container format ``SGI1`` (Spark Graft Image v1), little-endian:

    b"SGI1" | u8 mode | u16 w | u16 h | zlib(payload)

``mode`` 0 = lossless RGB24 (stands in for PNG);
``mode`` 1 = lossy: RGB quantized to 6 bits/channel before deflate
(stands in for JPEG; round-trip PSNR ~= 44 dB, comfortably over the
40 dB gate).
"""

import struct
import zlib

import numpy as np

MAGIC = b"SGI1"
MODE_LOSSLESS = 0   # 'png' stand-in
MODE_LOSSY = 1      # 'jpeg' stand-in

_FMT_TO_MODE = {'png': MODE_LOSSLESS, 'jpeg': MODE_LOSSY}


def encode(pixels: np.ndarray, fmt: str = 'png') -> bytes:
    """Encode an (h, w, 3) uint8 array into SGI1 bytes."""
    if pixels.dtype != np.uint8 or pixels.ndim != 3 or pixels.shape[2] != 3:
        raise ValueError("pixels must be (h, w, 3) uint8")
    mode = _FMT_TO_MODE[fmt]
    h, w = pixels.shape[:2]
    payload = pixels
    if mode == MODE_LOSSY:
        # 6-bit quantization, midpoint reconstruction at decode.
        payload = (pixels >> 2).astype(np.uint8)
    header = MAGIC + struct.pack('<BHH', mode, w, h)
    return header + zlib.compress(payload.tobytes(), level=1)


def decode(data: bytes) -> np.ndarray:
    """Decode SGI1 bytes into an (h, w, 3) uint8 array."""
    if data[:4] != MAGIC:
        return decode_real(data)
    mode, w, h = struct.unpack('<BHH', data[4:9])
    raw = np.frombuffer(zlib.decompress(data[9:]), dtype=np.uint8)
    pixels = raw.reshape(h, w, 3)
    if mode == MODE_LOSSY:
        # Midpoint reconstruction of the 6-bit quantization.
        pixels = np.minimum(pixels.astype(np.uint16) * 4 + 2, 255) \
            .astype(np.uint8)
    return pixels


def decode_real(data: bytes) -> np.ndarray:
    """STUB: decode a real PNG/JPEG byte stream.

    The image libraries (PIL / imageio) are not installed in this
    container.  On a real cluster, ship them with the job
    (``spark-submit --py-files deps.zip`` or a conda-packed env) and
    replace this body with ``np.asarray(PIL.Image.open(io.BytesIO(
    data)).convert('RGB'))``.
    """
    raise NotImplementedError(
        "Real PNG/JPEG decode needs PIL/imageio (not in this container); "
        "see docstring for the cluster deployment path.")


def regrid(pixels: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Resample pixels onto an (out_h, out_w) grid (nearest neighbour,
    deterministic).  Vectorized numpy -- no per-pixel Python."""
    h, w = pixels.shape[:2]
    rows = np.minimum((np.arange(out_h) * h) // out_h, h - 1)
    cols = np.minimum((np.arange(out_w) * w) // out_w, w - 1)
    return pixels[rows][:, cols]


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    """Peak signal-to-noise ratio in dB (inf for identical arrays)."""
    mse = np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2)
    if mse == 0:
        return float('inf')
    return 20.0 * np.log10(255.0) - 10.0 * np.log10(mse)
