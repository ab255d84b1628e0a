from vln_imagine_tpu.ops.masks import (
    length_to_mask,
    extend_neg_mask,
    masked_softmax,
    NEG_INF_MASK,
)
from vln_imagine_tpu.ops.angles import (
    angle_feature,
    view_heading,
    view_elevation,
    all_point_angle_feature,
)
