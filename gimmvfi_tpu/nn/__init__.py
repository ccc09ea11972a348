from .layers import (
    BatchNorm,
    Conv2d,
    PReLU,
    damping,
    instance_norm,
    leaky_relu,
    pixel_shuffle,
    sine,
)
