"""Dense BEV backbones & necks (flax.linen, NHWC).

Native re-provision of the mmdet3d ``SECOND`` backbone and ``SECONDFPN`` neck
that every reference config instantiates
(``configs/_base_/models/hv_pointpillars_secfpn_kitti.py:22-32``).  NHWC
layout end to end — the TPU conv-native layout — with BN eps/momentum matching
the reference norm_cfg (eps 1e-3, torch momentum 0.01).
"""
from __future__ import annotations

import os
from typing import Optional, Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops.pallas.bn_kernel import FastBatchNorm
from ..registry import MODELS

# Neck upsample lowering default: 'convt' (lax.conv_transpose) or 'd2s'
# (1x1 conv to s*s*C channels + depth-to-space reshape — the exact same
# function: a kernel-size==stride ConvTranspose has no tap overlap, so
# each input pixel independently emits an s x s block).  The d2s form is
# a pure MXU matmul at full 128-lane tiles instead of XLA's input-dilated
# conv lowering; measured on v5e (KITTI b4 bf16 dynamic, honest clock)
# the step drops 23.3 -> 22.1 ms — the entire win in the backward pass
# (bwd_opt 12.3 -> 10.4 ms), where the transposed-conv wgrad/dgrad
# lowering was the cost.  Default 'd2s' on that evidence; both forms
# share one checkpoint tree.  Read ONCE at import (jit caches don't key
# on env vars); per-module override via ``SECONDFPN.deconv_impl``.
DECONV_DEFAULT = os.environ.get('MMDET3D_TPU_DECONV', 'd2s')

# 1x1-conv lowering: 'mm' flattens pixels and uses dot_general, 'conv' keeps
# lax.conv_general_dilated.  XLA's TPU conv emitter picks batch-in-sublanes
# layouts (EmitAllBatchInSublanes) for small-batch BEV shapes; every reshape
# or flat-view consumer then pays a physical sublane relayout (the d2s neck's
# reshape/transpose ops ran ~0.2-0.7 ms each at KITTI b4 — pure copies).  A
# matmul keeps plain row-major {1,0} tiling so those reshapes are bitcasts.
# Read once at import (jit caches don't key on env vars).
CONV1X1_DEFAULT = os.environ.get('MMDET3D_TPU_1X1', 'mm')


def deconv_kernel_as_1x1(kern):
    """(s, s, cin, ch) ConvTranspose(k=s, stride=s) kernel -> the exact
    equivalent (1, 1, cin, s*s*ch) kernel for conv1x1 + depth_to_space.

    flax ConvTranspose(k=s, stride=s) places K[r, q] at output offset
    (s-1-r, s-1-q) of each s x s block (kernel spatially flipped) — no tap
    overlap, so each input pixel independently emits an s x s block."""
    s, _, cin, ch = kern.shape
    kf = kern[::-1, ::-1]
    return kf.transpose(2, 0, 1, 3).reshape(1, 1, cin, s * s * ch)


def depth_to_space(y, s: int, ch: int):
    """(B, H, W, s*s*ch) block-major channels -> (B, H*s, W*s, ch)."""
    b, hh, ww, _ = y.shape
    y = y.reshape(b, hh, ww, s, s, ch)
    y = y.transpose(0, 1, 3, 2, 4, 5)
    return y.reshape(b, hh * s, ww * s, ch)


def conv1x1(x, w, impl: Optional[str] = None):
    """1x1 'conv': (B, H, W, Cin) x (1, 1, Cin, Cout) -> (B, H, W, Cout).

    impl 'mm' (default): flat (B*H*W, Cin) @ (Cin, Cout) dot_general —
    identical math, row-major layouts.  impl 'conv': lax conv."""
    if (impl or CONV1X1_DEFAULT) == 'mm':
        b, h, wd, cin = x.shape
        w2 = w.reshape(w.shape[-2], w.shape[-1])
        y = jax.lax.dot_general(x.reshape(b * h * wd, cin), w2,
                                (((1,), (0,)), ((), ())),
                                preferred_element_type=x.dtype)
        return y.reshape(b, h, wd, w.shape[-1])
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding='VALID',
        dimension_numbers=('NHWC', 'HWIO', 'NHWC'))


def fold_s2d_kernel(w):
    """Fold a (3, 3, Cin, Cout) stride-2 kernel for a space-to-depth input.

    A 3x3/stride-2/pad-1 conv on (H, W, Cin) equals a 2x2/stride-1 conv
    with padding ((1,0),(1,0)) on the s2d input (H/2, W/2, 4*Cin): output
    pixel h reads input rows {2h-1, 2h, 2h+1} = s2d blocks {h-1 (parity
    1), h (parity 0), h (parity 1)} — tap dy maps to (block, parity) =
    (0,1) if dy==0 else (1, dy-1), same along W.  Channel layout matches
    ``ops/voxelize.py::bev_scatter_s2d``: parity index (py*2+px), blocks
    of Cin.  Differentiable in ``w`` (pure placement), so training learns
    the ORIGINAL kernel parameter."""
    kh, kw, cin, cout = w.shape
    assert kh == 3 and kw == 3, (kh, kw)
    folded = jnp.zeros((2, 2, 4 * cin, cout), w.dtype)
    for dy in range(3):
        bh, py = ((0, 1) if dy == 0 else (1, dy - 1))
        for dx in range(3):
            bw, px = ((0, 1) if dx == 0 else (1, dx - 1))
            off = (py * 2 + px) * cin
            folded = folded.at[bh, bw, off:off + cin, :].set(w[dy, dx])
    return folded


def fold_s2d_to_w2_kernel(w):
    """(3,3,Cin,Cout) stride-2 kernel -> s2d input, W-FOLDED output.

    Input: s2d canvas (B, H/2, W/2, 4*Cin); output: W-folded stage-1
    layout (B, H/2, W/4, 2*Cout) where channel q*Cout+co is logical
    channel co at output W-parity q.  Equivalent conv: kernel
    (2, 3, 4*Cin, 2*Cout), strides (1, 2), padding ((1,0),(1,0))."""
    kh, kw, cin, cout = w.shape
    assert kh == 3 and kw == 3
    folded = jnp.zeros((2, 3, 4 * cin, 2 * cout), w.dtype)
    for dy in range(3):
        bh, py = ((0, 1) if dy == 0 else (1, dy - 1))
        for q in range(2):
            for dx in range(3):
                t = 2 * q + dx - 1
                bw = t // 2 + 1          # block offset vs 2*W1-1 (pad 1)
                px = t % 2
                cin_off = (py * 2 + px) * cin
                folded = folded.at[
                    bh, bw, cin_off:cin_off + cin,
                    q * cout:(q + 1) * cout].set(w[dy, dx])
    return folded


def fold_w2_kernel(w):
    """(3,3,C,C) stride-1 kernel -> W-folded input AND output.

    On (B, H, W/2, 2C) tensors (channel px*C+c = logical c at W-parity
    px): kernel (3, 3, 2C, 2C), strides (1,1), padding ((1,1),(1,1)).
    Same function as the plain 3x3 conv on (B, H, W, C); 2x nominal
    flops (half the blocks structurally zero) at FULL 128-lane tiles,
    and every activation touches half the physical HBM (a 64-channel
    minor dim pads 64 -> 128 lanes)."""
    kh, kw, cin, cout = w.shape
    assert kh == 3 and kw == 3
    folded = jnp.zeros((3, 3, 2 * cin, 2 * cout), w.dtype)
    for dy in range(3):
        for q in range(2):
            for dx in range(3):
                t = q + dx - 1
                bw = (t + 2) // 2        # t=-1 -> 0; t=0,1 -> 1; t=2 -> 2
                px = t % 2
                folded = folded.at[
                    dy, bw, px * cin:(px + 1) * cin,
                    q * cout:(q + 1) * cout].set(w[dy, dx])
    return folded


def unfold_w2(x):
    """(B, H, W/2, 2C) W-folded -> (B, H, W, C): channel q*C+c is pixel
    (h, 2*w1+q, c), so the unfold is one reshape pair."""
    b, h, w1, c2 = x.shape
    c = c2 // 2
    return x.reshape(b, h, w1, 2, c).reshape(b, h, w1 * 2, c)


def halo_pad_h(x, k: int):
    """1-row H-halos for an H-chunked batch (B*k, h, w, c).

    Chunk rows of one image are stacked in the batch dim (chunk-major
    inside each image); the halo row comes from the neighboring chunk of
    the SAME image and is zero at image boundaries — so a pad-(0 in H)
    conv on the padded (B*k, h+2, w, c) tensor equals the pad-1 conv on
    the unchunked (B, k*h, w, c) tensor exactly.  BN stats are untouched
    (halo rows exist only in the conv input, never its output)."""
    bk = x.shape[0]
    cid = np.arange(bk) % k
    top = jnp.roll(x[:, -1:], 1, axis=0)
    bot = jnp.roll(x[:, :1], -1, axis=0)
    top = top * jnp.asarray((cid != 0).reshape(-1, 1, 1, 1), x.dtype)
    bot = bot * jnp.asarray((cid != k - 1).reshape(-1, 1, 1, 1), x.dtype)
    return jnp.concatenate([top, x, bot], axis=1)


class _W2ConvBNReLU(nn.Module):
    """Stride-1 ConvBNReLU on the W-folded layout; parameter tree
    identical to ``ConvBNReLU`` (conv/kernel (3,3,Cin,C), bn (C,)).

    ``chunks`` > 1: input is H-chunked into the batch dim ((B*k, h, w, c));
    the conv runs with explicit halo rows (``halo_pad_h``).  The TPU conv
    emitter packs batch into the 8 sublanes, so a small-batch BEV conv
    uses only B/8 of the MXU width — measured (3,3,128,128) on v5e bf16:
    (2, 468, 234) 65 TFLOP/s vs (8, 119, 234) 210 TFLOP/s."""
    channels: int
    in_channels: Optional[int] = None   # logical Cin (defaults to channels)
    axis_name: Optional[str] = None
    dtype: Optional[str] = None
    chunks: int = 1

    @nn.compact
    def __call__(self, x, train: bool):
        cin = self.in_channels or self.channels
        w = _ConvKernelParam(cin, self.channels, name='conv')()
        folded = fold_w2_kernel(w)
        if self.dtype is not None:
            folded = folded.astype(self.dtype)
            x = x.astype(self.dtype)
        if self.chunks > 1:
            x = halo_pad_h(x, self.chunks)
            pad_h = (0, 0)
        else:
            pad_h = (1, 1)
        x = jax.lax.conv_general_dilated(
            x, folded, window_strides=(1, 1), padding=(pad_h, (1, 1)),
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
        x = FastBatchNorm(use_running_average=not train, momentum=0.99,
                          epsilon=1e-3, axis_name=self.axis_name,
                          dtype=self.dtype, channel_fold=2, name='bn')(x)
        return nn.relu(x)


class _S2DDownConv(nn.Module):
    """Stride-2 ConvBNReLU consuming an s2d canvas (B, H/2, W/2, 4*Cin).

    Parameter tree identical to ``ConvBNReLU`` (conv/kernel of shape
    (3, 3, Cin, Cout), bn/...), so checkpoints transfer 1:1 with the
    plain-canvas model."""
    in_channels: int
    out_channels: int
    axis_name: Optional[str] = None
    dtype: Optional[str] = None
    fold_w2: bool = False     # emit the W-folded (B, H/2, W/4, 2C) layout

    @nn.compact
    def __call__(self, x, train: bool):
        w = _ConvKernelParam(self.in_channels, self.out_channels,
                             name='conv')()
        if self.fold_w2:
            folded = fold_s2d_to_w2_kernel(w)
            strides, pad = (1, 2), ((1, 0), (1, 0))
        else:
            folded = fold_s2d_kernel(w)
            strides, pad = (1, 1), ((1, 0), (1, 0))
        if self.dtype is not None:
            folded = folded.astype(self.dtype)
            x = x.astype(self.dtype)
        x = jax.lax.conv_general_dilated(
            x, folded, window_strides=strides, padding=pad,
            dimension_numbers=('NHWC', 'HWIO', 'NHWC'))
        x = FastBatchNorm(use_running_average=not train, momentum=0.99,
                          epsilon=1e-3, axis_name=self.axis_name,
                          dtype=self.dtype,
                          channel_fold=2 if self.fold_w2 else 1,
                          name='bn')(x)
        return nn.relu(x)


class _DeconvKernelParam(nn.Module):
    """Parameter-only twin of ``nn.ConvTranspose(...)``'s kernel (same
    name/shape/init) so the d2s neck path keeps the checkpoint tree."""
    cin: int
    features: int
    stride: int

    @nn.compact
    def __call__(self):
        return self.param('kernel', nn.initializers.lecun_normal(),
                          (self.stride, self.stride, self.cin,
                           self.features), jnp.float32)


class _ConvKernelParam(nn.Module):
    """Parameter-only twin of ``nn.Conv(...)``'s kernel (same name/shape/
    init) so _S2DDownConv keeps ConvBNReLU's checkpoint structure."""
    cin: int
    features: int

    @nn.compact
    def __call__(self):
        return self.param('kernel', nn.initializers.lecun_normal(),
                          (3, 3, self.cin, self.features), jnp.float32)


class ConvBNReLU(nn.Module):
    out_channels: int
    kernel: int = 3
    stride: int = 1
    axis_name: Optional[str] = None
    dtype: Optional[str] = None    # compute dtype ('bfloat16' for MXU speed)
    # H-chunked batch (see halo_pad_h / _W2ConvBNReLU): input is
    # (B*chunks, h, w, c); stride 2 consumes only a TOP halo row (pad-1
    # stride-2 k=3 reads rows -1 .. h-1 for even h)
    chunks: int = 1

    @nn.compact
    def __call__(self, x, train: bool):
        pad = self.kernel // 2
        if self.chunks > 1:
            assert self.kernel == 3, 'chunked conv assumes 3x3'
            if self.stride == 1:
                x = halo_pad_h(x, self.chunks)
            else:
                cid = np.arange(x.shape[0]) % self.chunks
                top = jnp.roll(x[:, -1:], 1, axis=0)
                top = top * jnp.asarray((cid != 0).reshape(-1, 1, 1, 1),
                                        x.dtype)
                x = jnp.concatenate([top, x], axis=1)
            pad_h = (0, 0)
        else:
            pad_h = (pad, pad)
        x = nn.Conv(self.out_channels, (self.kernel, self.kernel),
                    strides=(self.stride, self.stride),
                    padding=(pad_h, (pad, pad)), use_bias=False,
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
    # input is a space-to-depth canvas (B, H/2, W/2, 4*in_channels) from
    # ops/voxelize.bev_scatter_s2d; stage 0 must then be stride 2 and is
    # computed as the exactly-equivalent folded 2x2 conv (fold_s2d_kernel)
    input_s2d: bool = False
    # run the whole stage 0 in the W-folded (B, H/2, W/4, 2C) layout
    # (fold_w2_kernel): same function, full 128-lane tiles on every
    # stage-0 activation; unfolded once at the stage boundary
    fold_w2: bool = False
    # input is a W-folded canvas (B, ny, nx/2, 2*in_channels) from
    # ops/voxelize.bev_scatter_wfold; stage 0 must be stride 1 and runs
    # entirely in the folded layout (reference Waymo config shape)
    input_wfold: bool = False
    # H-chunk factor for the wfold stage 0: the canvas arrives with each
    # image's H split into ``chunk_h`` batch entries ((B*k, ny/k, ...), a
    # pure bitcast of the splat's flat raster) and stage-0 convs run at
    # batch B*k with explicit halo rows — the conv emitter packs batch
    # into sublanes, so B=2 uses 1/4 of the MXU width (see _W2ConvBNReLU)
    chunk_h: int = 1

    @nn.compact
    def __call__(self, x, train: bool = False):
        outs = []
        for i, (ch, num, stride) in enumerate(zip(
                self.out_channels, self.layer_nums, self.layer_strides)):
            if i == 0 and self.input_wfold:
                assert stride == 1, 'input_wfold requires a stride-1 stage 0'
                k = self.chunk_h
                x = _W2ConvBNReLU(ch, in_channels=self.in_channels,
                                  axis_name=self.axis_name, dtype=self.dtype,
                                  chunks=k,
                                  name='stage0_down')(x, train)
                for j in range(num):
                    x = _W2ConvBNReLU(ch, axis_name=self.axis_name,
                                      dtype=self.dtype, chunks=k,
                                      name=f'stage0_block{j}')(x, train)
                if k > 1:    # un-chunk: flat raster order is unchanged
                    bk, hh, wl, cl = x.shape
                    x = x.reshape(bk // k, hh * k, wl, cl)
                x = unfold_w2(x)
                outs.append(x)
                continue
            if i == 0 and self.input_s2d:
                assert stride == 2, 'input_s2d requires a stride-2 stage 0'
                x = _S2DDownConv(self.in_channels, ch,
                                 axis_name=self.axis_name, dtype=self.dtype,
                                 fold_w2=self.fold_w2,
                                 name='stage0_down')(x, train)
                for j in range(num):
                    if self.fold_w2:
                        x = _W2ConvBNReLU(ch, axis_name=self.axis_name,
                                          dtype=self.dtype,
                                          name=f'stage0_block{j}')(x, train)
                    else:
                        x = ConvBNReLU(ch, axis_name=self.axis_name,
                                       dtype=self.dtype,
                                       name=f'stage0_block{j}')(x, train)
                if self.fold_w2:
                    x = unfold_w2(x)
                outs.append(x)
                continue
            if x.shape[1] % stride or x.shape[2] % stride:
                raise ValueError(
                    f'SECOND stage {i}: spatial dims {x.shape[1:3]} not '
                    f'divisible by stride {stride} — pick a BEV canvas '
                    f'divisible by the cumulative stride product')
            # H-chunk small-batch stages into the batch dim (sublane MXU
            # occupancy, see _W2ConvBNReLU): in-chunk H must stay stride-
            # divisible; only worthwhile when batch < 4
            ck = 1
            if self.chunk_h > 1 and x.shape[0] <= 2:
                for k in (4, 3, 2):
                    if (x.shape[1] % (k * stride) == 0
                            and x.shape[0] * k <= 8):
                        ck = k
                        break
            if ck > 1:
                b0, h0, w0, c0 = x.shape
                x = x.reshape(b0 * ck, h0 // ck, w0, c0)
            x = ConvBNReLU(ch, stride=stride, axis_name=self.axis_name,
                           dtype=self.dtype, chunks=ck,
                           name=f'stage{i}_down')(x, train)
            for j in range(num):
                x = ConvBNReLU(ch, axis_name=self.axis_name,
                               dtype=self.dtype, chunks=ck,
                               name=f'stage{i}_block{j}')(x, train)
            if ck > 1:
                bk, hh, ww_, cc = x.shape
                x = x.reshape(bk // ck, hh * ck, ww_, cc)
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
    # upsample lowering: 'd2s' | 'convt'; None -> module-import default
    # (MMDET3D_TPU_DECONV).  An explicit field so the lowering is part of
    # module config — jit caches key on it (advisor r4 finding).
    deconv_impl: Optional[str] = None
    # False -> return the branch list instead of the channel concat; a
    # 1x1 consumer (Anchor3DHeadConvs) then sums per-branch matmuls and
    # the (B, H, W, sum(C)) concat never materializes
    concat_out: bool = True

    @nn.compact
    def __call__(self, feats, train: bool = False):
        impl = self.deconv_impl or DECONV_DEFAULT
        outs = []
        for i, (x, ch, s) in enumerate(zip(feats, self.out_channels,
                                           self.upsample_strides)):
            if s > 1 and impl == 'd2s':
                cin = x.shape[-1]
                kern = _DeconvKernelParam(cin, ch, s,
                                          name=f'deblock{i}_conv')()
                w1 = deconv_kernel_as_1x1(kern)
                if self.dtype is not None:
                    w1 = w1.astype(self.dtype)
                    x = x.astype(self.dtype)
                y = conv1x1(x, w1)
                y = FastBatchNorm(use_running_average=not train,
                                  momentum=0.99, epsilon=1e-3,
                                  axis_name=self.axis_name,
                                  dtype=self.dtype, channel_fold=s * s,
                                  name=f'deblock{i}_bn')(y)
                y = nn.relu(y)
                outs.append(depth_to_space(y, s, ch))
                continue
            if s > 1:
                x = nn.ConvTranspose(ch, (s, s), strides=(s, s),
                                     use_bias=False, dtype=self.dtype,
                                     name=f'deblock{i}_conv')(x)
            elif max(1, int(round(1 / s))) == 1:
                # stride-1 level: 1x1 conv lowered as a matmul (layout)
                wk = _DeconvKernelParam(x.shape[-1], ch, 1,
                                        name=f'deblock{i}_conv')()
                if self.dtype is not None:
                    wk = wk.astype(self.dtype)
                    x = x.astype(self.dtype)
                x = conv1x1(x, wk)
            else:
                k = max(1, int(round(1 / s)))
                x = nn.Conv(ch, (k, k), strides=(k, k), use_bias=False,
                            dtype=self.dtype, name=f'deblock{i}_conv')(x)
            x = FastBatchNorm(use_running_average=not train, momentum=0.99,
                              epsilon=1e-3, axis_name=self.axis_name,
                              dtype=self.dtype, name=f'deblock{i}_bn')(x)
            outs.append(nn.relu(x))
        if not self.concat_out:
            return tuple(outs)
        return jnp.concatenate(outs, axis=-1)
