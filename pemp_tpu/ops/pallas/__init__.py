from pemp_tpu.ops.pallas.mpm import (
    meta_prototype_assign_pallas,
    prototype_match_pallas,
    pallas_available,
)

__all__ = ["meta_prototype_assign_pallas", "prototype_match_pallas",
           "pallas_available"]
