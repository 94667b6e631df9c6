from xmc_gan_tpu.ops.initializers import (
    he_normal_fan_in,
    torch_default_kernel_init,
    torch_default_bias_init,
    zeros_init,
    ones_init,
)
from xmc_gan_tpu.ops.images import to_unit_range
from xmc_gan_tpu.ops.modules import (
    SNConv,
    SNDense,
    avg_pool,
    global_avg_pool,
    upsample_nearest_2x,
    leaky_relu,
)

__all__ = [
    "to_unit_range",
    "he_normal_fan_in",
    "torch_default_kernel_init",
    "torch_default_bias_init",
    "zeros_init",
    "ones_init",
    "SNConv",
    "SNDense",
    "avg_pool",
    "global_avg_pool",
    "upsample_nearest_2x",
    "leaky_relu",
]
