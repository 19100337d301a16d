"""The flagship pipeline: parse PLSS descriptions into a polygon
layer, derive anchor points from image phashes, spatial-join, and
assign each image to its (trs, qq) aliquot tile.

    descs ──parse_documents──▶ tracts ──parse_tract_details──▶ qqs
          ──decompose_trs──▶ numeric keys ──build_polygon_layer──▶ polys
    images ──with_anchor (no bytes!)──▶ points
    points ⋈ broadcast(poly cell index) ──PIP──▶ matches ──▶ tiles

``bytes`` never enters the join path (late projection); the raster
stage re-joins it by image_id.
"""

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .operators.parse import parse_documents_full
from .spatial.grid import build_polygon_layer, with_anchor
from .spatial.join import (
    JOIN_RES,
    assign_tiles_fused,
    assign_tiles_local,
    spatial_join,
)


def polygon_layer_from_descs(descs: DataFrame,
                             text_col: str = 'raw_desc') -> DataFrame:
    """Raw description documents -> (trs, qq) polygon rows.

    One fused Arrow-batched UDF does document parse + tract parse +
    TRS decomposition, so downstream geometry references materialized
    columns (not replicated regexp trees) and each task holds one
    Python worker (not a chain of three).
    """
    tracts = parse_documents_full(descs, text_col=text_col)
    return build_polygon_layer(tracts)


def assign_images_to_tiles(images: DataFrame, polygons: DataFrame,
                           res: int = JOIN_RES, salt: int = 0,
                           payload_cols=('caption', 'x', 'y')) \
        -> DataFrame:
    """images (input_hint shape) x polygon layer -> one tile per image.

    Output: image_id, *payload_cols, trs, qq (sorted-set comparable;
    the default payload keeps the caption and anchor x/y, i.e. the
    full historical output).  Pass ``payload_cols=()`` for the pure
    assignment (image_id, trs, qq) -- at 10^11-row scale payload
    bytes through the Python crossing are the bottleneck (x/y still
    feed the ray cast worker-side; they just don't cross back), and
    the late-materialization policy (re-join payload by image_id only
    where needed) is the same one that keeps ``bytes`` out of the
    join path.
    """
    points = with_anchor(images)
    # One fused mapInArrow does cell-join refinement + PIP + winner
    # reduction: the candidate stream through Arrow carries an int32
    # pid instead of ring arrays, and NOTHING shuffles end to end
    # (see assign_tiles_fused; row-identical to the unfused
    # spatial_join -> assign_tiles_local composition, which remains
    # for stage-level tests).
    return assign_tiles_fused(points, polygons, res=res, salt=salt,
                              payload_cols=payload_cols)


def run_flagship(spark, images: DataFrame, descs: DataFrame,
                 salt: int = 0) -> DataFrame:
    polygons = polygon_layer_from_descs(descs)
    return assign_images_to_tiles(images, polygons, salt=salt)


def run_raster(images: DataFrame, polygons: DataFrame,
               tile_px: int = 64, patch_px: int = 16) -> DataFrame:
    """G8 end to end: assign tiles on the bytes-free projection, then
    re-join ``bytes`` by image_id and composite one raster per
    (trs, qq) aliquot."""
    from .raster import materialize_tiles
    points = with_anchor(images)
    assigned = assign_tiles_local(spatial_join(points, polygons))
    return materialize_tiles(assigned, images,
                             tile_px=tile_px, patch_px=patch_px)
