"""Dense BEV backbones & necks (flax.linen, NHWC).

Native re-provision of the mmdet3d ``SECOND`` backbone and ``SECONDFPN`` neck
that every reference config instantiates
(``configs/_base_/models/hv_pointpillars_secfpn_kitti.py:22-32``).  NHWC
layout end to end — the TPU conv-native layout — with BN eps/momentum matching
the reference norm_cfg (eps 1e-3, torch momentum 0.01).
"""
from __future__ import annotations

from typing import Optional, Sequence

import flax.linen as nn
import jax.numpy as jnp

from ..ops.pallas.bn_kernel import FastBatchNorm
from ..registry import MODELS


class ConvBNReLU(nn.Module):
    out_channels: int
    kernel: int = 3
    stride: int = 1
    axis_name: Optional[str] = None
    dtype: Optional[str] = None    # compute dtype ('bfloat16' for MXU speed)

    @nn.compact
    def __call__(self, x, train: bool):
        pad = self.kernel // 2
        x = nn.Conv(self.out_channels, (self.kernel, self.kernel),
                    strides=(self.stride, self.stride),
                    padding=((pad, pad), (pad, pad)), use_bias=False,
                    dtype=self.dtype, name='conv')(x)
        # dtype threads through BN so bf16 activations STAY bf16 between
        # fusions (stats are still f32).  FastBatchNorm computes the
        # moments with the one-pass Pallas kernel (ops/pallas/bn_kernel):
        # XLA's standalone stat reductions ran ~10x off the HBM roofline.
        x = FastBatchNorm(use_running_average=not train, momentum=0.99,
                          epsilon=1e-3, axis_name=self.axis_name,
                          dtype=self.dtype, name='bn')(x)
        return nn.relu(x)


@MODELS.register_module()
class SECOND(nn.Module):
    """Multi-stage 2D conv backbone over the BEV canvas.

    Stage i: strided ConvBNReLU then ``layer_nums[i]`` ConvBNReLU blocks.
    Returns one feature map per stage (reference SECOND contract).
    """
    in_channels: int = 64
    out_channels: Sequence[int] = (64, 128, 256)
    layer_nums: Sequence[int] = (3, 5, 5)
    layer_strides: Sequence[int] = (2, 2, 2)
    axis_name: Optional[str] = None
    dtype: Optional[str] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        outs = []
        for i, (ch, num, stride) in enumerate(zip(
                self.out_channels, self.layer_nums, self.layer_strides)):
            if x.shape[1] % stride or x.shape[2] % stride:
                raise ValueError(
                    f'SECOND stage {i}: spatial dims {x.shape[1:3]} not '
                    f'divisible by stride {stride} — pick a BEV canvas '
                    f'divisible by the cumulative stride product')
            x = ConvBNReLU(ch, stride=stride, axis_name=self.axis_name,
                           dtype=self.dtype,
                           name=f'stage{i}_down')(x, train)
            for j in range(num):
                x = ConvBNReLU(ch, axis_name=self.axis_name,
                               dtype=self.dtype,
                               name=f'stage{i}_block{j}')(x, train)
            outs.append(x)
        return outs


@MODELS.register_module()
class SECONDFPN(nn.Module):
    """Upsample-and-concat neck (reference SECONDFPN contract).

    Per level: ConvTranspose (stride>1) or stride-1 Conv, BN, ReLU; outputs
    concatenated on channels -> single fused map.
    """
    in_channels: Sequence[int] = (64, 128, 256)
    out_channels: Sequence[int] = (128, 128, 128)
    upsample_strides: Sequence[int] = (1, 2, 4)
    axis_name: Optional[str] = None
    dtype: Optional[str] = None

    @nn.compact
    def __call__(self, feats, train: bool = False):
        outs = []
        for i, (x, ch, s) in enumerate(zip(feats, self.out_channels,
                                           self.upsample_strides)):
            if s > 1:
                x = nn.ConvTranspose(ch, (s, s), strides=(s, s),
                                     use_bias=False, dtype=self.dtype,
                                     name=f'deblock{i}_conv')(x)
            else:
                k = max(1, int(round(1 / s)))
                x = nn.Conv(ch, (k, k), strides=(k, k), use_bias=False,
                            dtype=self.dtype, name=f'deblock{i}_conv')(x)
            x = FastBatchNorm(use_running_average=not train, momentum=0.99,
                              epsilon=1e-3, axis_name=self.axis_name,
                              dtype=self.dtype, name=f'deblock{i}_bn')(x)
            outs.append(nn.relu(x))
        return jnp.concatenate(outs, axis=-1)
