from tdeed_tpu.ops.temporal import (  # noqa: F401
    adaptive_max_pool1d,
    linear_upsample_matrix,
    linear_upsample,
    lshift_zero,
    rshift_zero,
)
from tdeed_tpu.ops.displacement import decode_displacement, soft_labels_from_displacement  # noqa: F401
