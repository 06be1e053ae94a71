"""TPU-native ops: upfirdn2d and fused bias+LeakyReLU.

These replace the reference's two CUDA extensions
(reference: diagan-pkg/diagan/models/op/upfirdn2d_kernel.cu,
 diagan-pkg/diagan/models/op/fused_bias_act_kernel.cu) with
XLA-fused and Pallas implementations operating on NHWC arrays.
"""
from diagan_tpu.ops.upfirdn2d import (
    upfirdn2d,
    upfirdn2d_ref,
    make_resample_kernel,
)
from diagan_tpu.ops.fused_act import fused_leaky_relu
from diagan_tpu.ops.fir_pallas import upfirdn2d_pallas
from diagan_tpu.ops.warp_pallas import affine_gather

__all__ = [
    "upfirdn2d",
    "upfirdn2d_ref",
    "upfirdn2d_pallas",
    "make_resample_kernel",
    "fused_leaky_relu",
    "affine_gather",
]
