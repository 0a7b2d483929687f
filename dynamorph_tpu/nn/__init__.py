from .functional import (
    conv2d,
    conv_transpose2d,
    batch_norm,
    linear,
    init_conv,
    init_conv_transpose,
    init_batch_norm,
    init_linear,
    relu,
    sigmoid,
)
