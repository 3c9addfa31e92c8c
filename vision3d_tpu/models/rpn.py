"""2D BEV RPN backbone (SECOND one-stage RPN).

Behavioral spec from the reference (vision3d/detector/second.py:49-94):
one stride-1 3x3 conv + 5 more 3x3 convs ("down block") followed by a 1x1
conv ("up block"), each Conv-BN-ReLU, all at 128 channels, xavier-normal
conv init, BN eps 1e-3 / torch momentum 0.01. NHWC here (TPU-native
layout); the checkpoint converter handles NCHW->NHWC transposition.
"""

import flax.linen as nn


class ConvBNReLU(nn.Module):
    features: int
    kernel: int = 3

    @nn.compact
    def __call__(self, x, train: bool):
        x = nn.Conv(
            self.features,
            (self.kernel, self.kernel),
            padding=self.kernel // 2,
            use_bias=False,
            kernel_init=nn.initializers.xavier_normal(),
        )(x)
        x = nn.BatchNorm(
            use_running_average=not train, momentum=0.99, epsilon=1e-3
        )(x)
        return nn.relu(x)


class RPN(nn.Module):
    c_down: int = 128
    c_up: int = 128
    blocks: int = 5

    @nn.compact
    def __call__(self, x, train: bool = False):
        for _ in range(1 + self.blocks):
            x = ConvBNReLU(self.c_down)(x, train)
        return ConvBNReLU(self.c_up, kernel=1)(x, train)
