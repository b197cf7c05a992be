from .layers import (
    conv2d, conv2d_init, conv2d_reflect, conv2d_transpose, conv2d_transpose_init,
    dense, dense_init, leaky_relu, relu, tanh, dropout, reflect_pad,
    glorot_uniform, normal_init,
)
from .norm import instance_norm, instance_norm_init, batch_norm, batch_norm_init
from .deriv import (
    deriv_kernel_sobel, deriv_kernel_diff, depthwise_conv2d, tf_deriv,
    seg_boundary_weight,
)

__all__ = [
    "conv2d", "conv2d_init", "conv2d_reflect", "conv2d_transpose", "conv2d_transpose_init",
    "dense", "dense_init", "leaky_relu", "relu", "tanh", "dropout",
    "reflect_pad", "glorot_uniform", "normal_init",
    "instance_norm", "instance_norm_init", "batch_norm", "batch_norm_init",
    "deriv_kernel_sobel", "deriv_kernel_diff", "depthwise_conv2d", "tf_deriv",
    "seg_boundary_weight",
]
