"""G8: raster <-> vector tile materialization (SURVEY.md §2.7).

Two operators over the image table + tile assignments, both Arrow-
batched (grouped-map / scalar pandas UDFs; no per-row Python outside
the numpy kernels; cf. Raptor VLDB'19 raster+vector pattern in
PAPERS.md):

- :func:`regrid_images` -- per-image decode -> regrid (nearest-
  neighbour resample) -> re-encode in the same format.  The lossy
  round trip must hold PSNR >= 40 dB (input_hint invariant; the
  SGI1 lossy mode measures ~44 dB).

- :func:`materialize_tiles` -- one raster tile per (trs, qq) aliquot:
  every image assigned to the tile is decoded, regridded to a fixed
  patch, and composited into the tile raster at the image's anchor
  position within the aliquot box (painter's order = ascending
  image_id, so output bytes are deterministic under any parallelism).
  Output is lossless-encoded, so decode(tile) is exactly the composite.

``bytes`` enters the plan only here (late projection): the join /
assignment pipeline runs on a bytes-free projection and this stage
re-joins ``bytes`` by image_id -- at 100 TB the binary column
dominates I/O, so it must never ride through the spatial shuffle.
"""

import zlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from . import imagecodec

_REGRID_RESULT = T.StructType([
    T.StructField('bytes', T.BinaryType()),
    T.StructField('psnr_db', T.DoubleType()),
])


def regrid_images(images: DataFrame, out_h: int = 32,
                  out_w: int = 32) -> DataFrame:
    """Decode -> regrid -> re-encode each image; adds ``bytes_regrid``
    and ``psnr_db`` (regridded pixels vs their encode round trip)."""

    @F.pandas_udf(_REGRID_RESULT)
    def kernel(blobs: pd.Series, fmts: pd.Series) -> pd.DataFrame:
        out_bytes, out_psnr = [], []
        for blob, fmt in zip(blobs, fmts):
            if blob is None:
                out_bytes.append(None)
                out_psnr.append(None)
                continue
            pixels = imagecodec.decode(bytes(blob))
            re = imagecodec.regrid(pixels, out_h, out_w)
            enc = imagecodec.encode(re, fmt)
            out_psnr.append(imagecodec.psnr(re, imagecodec.decode(enc)))
            out_bytes.append(enc)
        return pd.DataFrame({'bytes': out_bytes, 'psnr_db': out_psnr})

    res = kernel(F.col('bytes'), F.col('fmt'))
    return images.withColumn('_r', res) \
        .withColumn('bytes_regrid', F.col('_r')['bytes']) \
        .withColumn('psnr_db', F.col('_r')['psnr_db']).drop('_r')


_TILE_SCHEMA = ('trs string, qq string, n_images long, w int, h int, '
                'tile binary, checksum long')


def materialize_tiles(assignments: DataFrame, images: DataFrame,
                      tile_px: int = 64, patch_px: int = 16) -> DataFrame:
    """One composited raster tile per (trs, qq).

    ``assignments``: output of the tile-assignment stage -- needs
    ``image_id, trs, qq, x, y`` plus the aliquot box ``xmin, ymin,
    xmax, ymax``.  ``images``: the raw table (only ``image_id, bytes``
    are read -- column pruning keeps the rest out of the scan).

    Grouped-map pandas UDF per tile; painter's order ascending
    image_id makes the composite deterministic.  The shuffle key is
    (trs, qq) -- dense tiles are bounded by the assignment stage's
    skew handling upstream, and a tile's images must colocate anyway
    to composite.
    """
    need = assignments.select('image_id', 'trs', 'qq', 'x', 'y',
                              'xmin', 'ymin', 'xmax', 'ymax')
    withbytes = need.join(images.select('image_id', 'bytes'), 'image_id')

    def composite(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values('image_id')
        raster = np.zeros((tile_px, tile_px, 3), dtype=np.uint8)
        x0 = float(pdf['xmin'].iloc[0])
        y0 = float(pdf['ymin'].iloc[0])
        x1 = float(pdf['xmax'].iloc[0])
        y1 = float(pdf['ymax'].iloc[0])
        sx = tile_px / (x1 - x0)
        sy = tile_px / (y1 - y0)
        # zip over plain arrays: per-image decode is inherent, but
        # iterrows adds a pandas Series construction per row.
        for buf, x, y in zip(pdf['bytes'].to_numpy(),
                             pdf['x'].to_numpy(), pdf['y'].to_numpy()):
            if buf is None:
                continue
            patch = imagecodec.regrid(
                imagecodec.decode(bytes(buf)), patch_px, patch_px)
            # Anchor -> pixel position (y axis flips: raster row 0 is
            # the north edge).
            px = int((x - x0) * sx)
            py = int((y1 - y) * sy)
            r0 = max(0, min(py - patch_px // 2, tile_px - patch_px))
            c0 = max(0, min(px - patch_px // 2, tile_px - patch_px))
            raster[r0:r0 + patch_px, c0:c0 + patch_px] = patch
        enc = imagecodec.encode(raster, 'png')   # lossless
        return pd.DataFrame([{
            'trs': pdf['trs'].iloc[0], 'qq': pdf['qq'].iloc[0],
            'n_images': len(pdf), 'w': tile_px, 'h': tile_px,
            'tile': enc,
            'checksum': np.int64(
                np.uint64(zlib.crc32(raster.tobytes()))
                ^ np.uint64(len(pdf))).item(),
        }])

    return withbytes.groupBy('trs', 'qq').applyInPandas(
        composite, schema=_TILE_SCHEMA)
