from pemp_tpu.ops.resize import (
    resize_bilinear_align_corners,
    resize_nearest,
)
from pemp_tpu.ops.dropblock import dropblock_2d
from pemp_tpu.ops.prototypes import (
    masked_average_pooling,
    cosine_similarity,
    prototype_predictions,
    meta_prototype_assign,
)
from pemp_tpu.ops.edt import (
    euclidean_distance_transform,
    boundary_map,
    edt_boundary_weight,
)

__all__ = [
    "resize_bilinear_align_corners", "resize_nearest", "dropblock_2d",
    "masked_average_pooling", "cosine_similarity", "prototype_predictions",
    "meta_prototype_assign", "euclidean_distance_transform", "boundary_map",
    "edt_boundary_weight",
]
