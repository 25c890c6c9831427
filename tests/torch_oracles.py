"""Torch oracles of the UPSTREAM mmdet/mmdet3d pieces the reference builds on.

The reference package (``/root/reference/mmdet3d_gaussian``) layers deltas on
top of mmcv/mmdet/mmdet3d, which are not installed here.  To run the
reference's own files on CPU (tests/test_reference_parity_model.py) we supply
faithful torch transcriptions of exactly the upstream symbols those files
import: ``PFNLayer``/``get_paddings_indicator``
(mmdet3d.models.voxel_encoders.utils), the SECOND backbone and SECONDFPN neck
(mmdet3d.models.backbones/necks), ``DeltaXYZWLHRBBoxCoder``
(mmdet3d.core.bbox), the mmdet losses (FocalLoss, SmoothL1Loss,
CrossEntropyLoss), and ``Anchor3DHead.add_sin_difference``.

These transcriptions follow the public upstream semantics cited in SURVEY.md
(BN1d eps=1e-3/momentum=0.01, unmasked max over padded pillar rows, xy deltas
normalized by the anchor BEV diagonal, ...) — they are test fixtures, not
product code.
"""
import torch
import torch.nn.functional as F
from torch import nn


# ---------------------------------------------------------------- reduction
def weight_reduce_loss(loss, weight=None, reduction='mean', avg_factor=None):
    """mmdet.models.losses.utils semantics."""
    if weight is not None:
        loss = loss * weight
    if avg_factor is None:
        if reduction == 'mean':
            return loss.mean()
        if reduction == 'sum':
            return loss.sum()
        return loss
    if reduction == 'mean':
        return loss.sum() / avg_factor
    if reduction == 'none':
        return loss
    raise ValueError('avg_factor + sum unsupported')


# ------------------------------------------------------------------- losses
class TorchFocalLoss(nn.Module):
    """mmdet FocalLoss (py_sigmoid_focal_loss path), use_sigmoid=True."""

    def __init__(self, use_sigmoid=True, gamma=2.0, alpha=0.25,
                 reduction='mean', loss_weight=1.0):
        super().__init__()
        assert use_sigmoid
        self.gamma, self.alpha = gamma, alpha
        self.reduction, self.loss_weight = reduction, loss_weight

    def forward(self, pred, target, weight=None, avg_factor=None):
        num_classes = pred.size(1)
        tgt = F.one_hot(target.long(), num_classes + 1)[:, :num_classes]
        tgt = tgt.type_as(pred)
        p = pred.sigmoid()
        pt = (1 - p) * tgt + p * (1 - tgt)
        focal_w = (self.alpha * tgt + (1 - self.alpha) * (1 - tgt)) \
            * pt.pow(self.gamma)
        loss = F.binary_cross_entropy_with_logits(
            pred, tgt, reduction='none') * focal_w
        if weight is not None and weight.dim() == 1:
            weight = weight.view(-1, 1)
        return self.loss_weight * weight_reduce_loss(
            loss, weight, self.reduction, avg_factor)


class TorchSmoothL1Loss(nn.Module):
    def __init__(self, beta=1.0, reduction='mean', loss_weight=1.0):
        super().__init__()
        self.beta, self.reduction, self.loss_weight = beta, reduction, \
            loss_weight

    def forward(self, pred, target, weight=None, avg_factor=None):
        diff = (pred - target).abs()
        loss = torch.where(diff < self.beta,
                           0.5 * diff * diff / self.beta,
                           diff - 0.5 * self.beta)
        return self.loss_weight * weight_reduce_loss(
            loss, weight, self.reduction, avg_factor)


class TorchCrossEntropyLoss(nn.Module):
    def __init__(self, use_sigmoid=False, reduction='mean', loss_weight=1.0):
        super().__init__()
        self.use_sigmoid = use_sigmoid
        self.reduction, self.loss_weight = reduction, loss_weight

    def forward(self, pred, target, weight=None, avg_factor=None):
        if self.use_sigmoid:
            loss = F.binary_cross_entropy_with_logits(
                pred, target.float(), reduction='none')
        else:
            loss = F.cross_entropy(pred, target.long(), reduction='none')
        return self.loss_weight * weight_reduce_loss(
            loss, weight, self.reduction, avg_factor)


def build_loss_oracle(cfg, gd_loss_cls=None):
    """mmdet3d.models.builder.build_loss stand-in for the parity tests."""
    cfg = dict(cfg)
    t = cfg.pop('type')
    if t == 'FocalLoss':
        return TorchFocalLoss(**cfg)
    if t == 'SmoothL1Loss':
        return TorchSmoothL1Loss(**cfg)
    if t == 'CrossEntropyLoss':
        return TorchCrossEntropyLoss(**cfg)
    if t == 'GDLoss':
        assert gd_loss_cls is not None, 'pass the reference GDLoss class'
        return gd_loss_cls(**cfg)
    raise KeyError(t)


# -------------------------------------------------------------------- coder
class TorchDeltaXYZWLHRBBoxCoder:
    """mmdet3d DeltaXYZWLHRBBoxCoder (decode used at
    reference gd_anchor3d_head.py:133-136)."""

    code_size = 7

    @staticmethod
    def encode(anchors, gt):
        xa, ya, za, wa, la, ha, ra = torch.split(anchors, 1, dim=-1)
        xg, yg, zg, wg, lg, hg, rg = torch.split(gt, 1, dim=-1)
        za = za + ha / 2
        zg = zg + hg / 2
        diag = torch.sqrt(la ** 2 + wa ** 2)
        xt = (xg - xa) / diag
        yt = (yg - ya) / diag
        zt = (zg - za) / ha
        lt = torch.log(lg / la)
        wt = torch.log(wg / wa)
        ht = torch.log(hg / ha)
        rt = rg - ra
        return torch.cat([xt, yt, zt, wt, lt, ht, rt], dim=-1)

    @staticmethod
    def decode(anchors, deltas):
        xa, ya, za, wa, la, ha, ra = torch.split(anchors, 1, dim=-1)
        xt, yt, zt, wt, lt, ht, rt = torch.split(deltas, 1, dim=-1)
        za = za + ha / 2
        diag = torch.sqrt(la ** 2 + wa ** 2)
        xg = xt * diag + xa
        yg = yt * diag + ya
        zg = zt * ha + za
        lg = torch.exp(lt) * la
        wg = torch.exp(wt) * wa
        hg = torch.exp(ht) * ha
        rg = rt + ra
        zg = zg - hg / 2
        return torch.cat([xg, yg, zg, wg, lg, hg, rg], dim=-1)


def add_sin_difference(boxes1, boxes2):
    """mmdet3d Anchor3DHead.add_sin_difference."""
    rad_pred = torch.sin(boxes1[..., 6:7]) * torch.cos(boxes2[..., 6:7])
    rad_tg = torch.cos(boxes1[..., 6:7]) * torch.sin(boxes2[..., 6:7])
    boxes1 = torch.cat([boxes1[..., :6], rad_pred, boxes1[..., 7:]], dim=-1)
    boxes2 = torch.cat([boxes2[..., :6], rad_tg, boxes2[..., 7:]], dim=-1)
    return boxes1, boxes2


# ------------------------------------------------------- pillar encoder bits
def get_paddings_indicator(actual_num, max_num, axis=0):
    """mmdet3d.models.voxel_encoders.utils.get_paddings_indicator."""
    actual_num = torch.unsqueeze(actual_num, axis + 1)
    max_num_shape = [1] * len(actual_num.shape)
    max_num_shape[axis + 1] = -1
    max_num = torch.arange(
        max_num, dtype=torch.int, device=actual_num.device).view(
        max_num_shape)
    return actual_num.int() > max_num


class PFNLayer(nn.Module):
    """mmdet3d PFNLayer: Linear(no bias) -> BN1d -> ReLU -> max over points.

    The max runs over ALL rows including zero-padded ones (the upstream
    quirk the reference inherits)."""

    def __init__(self, in_channels, out_channels,
                 norm_cfg=dict(type='BN1d', eps=1e-3, momentum=0.01),
                 last_layer=False, mode='max'):
        super().__init__()
        self.last_vfe = last_layer
        if not self.last_vfe:
            out_channels = out_channels // 2
        self.units = out_channels
        self.norm = nn.BatchNorm1d(self.units,
                                   eps=norm_cfg.get('eps', 1e-3),
                                   momentum=norm_cfg.get('momentum', 0.01))
        self.linear = nn.Linear(in_channels, self.units, bias=False)
        assert mode in ('max', 'avg')
        self.mode = mode

    def forward(self, inputs, num_voxels=None, aligned_distance=None):
        x = self.linear(inputs)
        x = self.norm(x.permute(0, 2, 1).contiguous()).permute(
            0, 2, 1).contiguous()
        x = F.relu(x)
        if self.mode == 'max':
            if aligned_distance is not None:
                x = x.mul(aligned_distance.unsqueeze(-1))
            x_max = torch.max(x, dim=1, keepdim=True)[0]
        else:
            if aligned_distance is not None:
                x = x.mul(aligned_distance.unsqueeze(-1))
            x_max = x.sum(dim=1, keepdim=True) / num_voxels.type_as(
                inputs).view(-1, 1, 1)
        if self.last_vfe:
            return x_max
        x_repeat = x_max.repeat(1, inputs.shape[1], 1)
        return torch.cat([x, x_repeat], dim=2)


def build_norm_layer(norm_cfg, num_features):
    """mmcv.cnn.build_norm_layer stand-in for BN1d/BN2d configs."""
    t = norm_cfg.get('type', 'BN1d')
    eps = norm_cfg.get('eps', 1e-5)
    momentum = norm_cfg.get('momentum', 0.1)
    if t in ('BN1d', 'naiveSyncBN1d', 'SyncBN'):
        return 'bn', nn.BatchNorm1d(num_features, eps=eps, momentum=momentum)
    if t in ('BN', 'BN2d', 'naiveSyncBN2d'):
        return 'bn', nn.BatchNorm2d(num_features, eps=eps, momentum=momentum)
    raise KeyError(t)


# -------------------------------------------------------- SECOND / SECONDFPN
class TorchSECOND(nn.Module):
    """mmdet3d SECOND backbone (configs hv_pointpillars_secfpn_kitti.py:22-27):
    per stage one strided 3x3 ConvBNReLU then layer_nums[i] 3x3 ConvBNReLU."""

    def __init__(self, in_channels=64, out_channels=(64, 128, 256),
                 layer_nums=(3, 5, 5), layer_strides=(2, 2, 2),
                 norm_eps=1e-3, norm_momentum=0.01):
        super().__init__()
        blocks = []
        c_in = in_channels
        for ch, num, stride in zip(out_channels, layer_nums, layer_strides):
            layers = [nn.Conv2d(c_in, ch, 3, stride=stride, padding=1,
                                bias=False),
                      nn.BatchNorm2d(ch, eps=norm_eps,
                                     momentum=norm_momentum),
                      nn.ReLU(inplace=True)]
            for _ in range(num):
                layers += [nn.Conv2d(ch, ch, 3, padding=1, bias=False),
                           nn.BatchNorm2d(ch, eps=norm_eps,
                                          momentum=norm_momentum),
                           nn.ReLU(inplace=True)]
            blocks.append(nn.Sequential(*layers))
            c_in = ch
        self.blocks = nn.ModuleList(blocks)

    def forward(self, x):
        outs = []
        for b in self.blocks:
            x = b(x)
            outs.append(x)
        return outs


class TorchSECONDFPN(nn.Module):
    """mmdet3d SECONDFPN: per level ConvTranspose2d(stride=k) (or stride-1
    conv) + BN + ReLU, concat on channels."""

    def __init__(self, in_channels=(64, 128, 256),
                 out_channels=(128, 128, 128), upsample_strides=(1, 2, 4),
                 norm_eps=1e-3, norm_momentum=0.01):
        super().__init__()
        deblocks = []
        for c_in, c_out, s in zip(in_channels, out_channels,
                                  upsample_strides):
            if s > 1:
                conv = nn.ConvTranspose2d(c_in, c_out, s, stride=s,
                                          bias=False)
            else:
                k = max(1, int(round(1 / s)))
                conv = nn.Conv2d(c_in, c_out, k, stride=k, bias=False)
            deblocks.append(nn.Sequential(
                conv,
                nn.BatchNorm2d(c_out, eps=norm_eps, momentum=norm_momentum),
                nn.ReLU(inplace=True)))
        self.deblocks = nn.ModuleList(deblocks)

    def forward(self, feats):
        return torch.cat([d(f) for d, f in zip(self.deblocks, feats)], dim=1)


# ---------------------------------------------------------------- centerhead
def multi_apply(func, *args, **kwargs):
    """mmdet.core.multi_apply transcription: map + transpose to tuples of
    lists (imported by the reference at gd_centerpoint_head.py:10)."""
    import functools
    pfunc = functools.partial(func, **kwargs) if kwargs else func
    map_results = map(pfunc, *args)
    return tuple(map(list, zip(*map_results)))


def clip_sigmoid(x, eps=1e-4):
    """mmdet3d.models.utils.clip_sigmoid transcription."""
    return torch.clamp(x.sigmoid(), min=eps, max=1 - eps)


def gaussian_2d(shape, sigma=1.0):
    """mmdet3d gaussian_2d: float64 numpy Gaussian patch with tiny values
    zeroed (upstream core/utils/gaussian.py semantics)."""
    import numpy as np
    m, n = [(ss - 1.0) / 2.0 for ss in shape]
    y, x = np.ogrid[-m:m + 1, -n:n + 1]
    h = np.exp(-(x * x + y * y) / (2 * sigma * sigma))
    h[h < np.finfo(h.dtype).eps * h.max()] = 0
    return h


def draw_heatmap_gaussian(heatmap, center, radius, k=1):
    """mmdet3d draw_heatmap_gaussian transcription: in-place max of a
    (2r+1)^2 Gaussian patch (sigma = diameter/6) clipped at the canvas
    edges; indexes heatmap[y, x]."""
    diameter = 2 * radius + 1
    gaussian = gaussian_2d((diameter, diameter), sigma=diameter / 6.0)
    x, y = int(center[0]), int(center[1])
    height, width = heatmap.shape[0:2]
    left, right = min(x, radius), min(width - x, radius + 1)
    top, bottom = min(y, radius), min(height - y, radius + 1)
    masked_heatmap = heatmap[y - top:y + bottom, x - left:x + right]
    masked_gaussian = torch.as_tensor(
        gaussian[radius - top:radius + bottom,
                 radius - left:radius + right], dtype=heatmap.dtype)
    if min(masked_gaussian.shape) > 0 and min(masked_heatmap.shape) > 0:
        torch.max(masked_heatmap, masked_gaussian * k, out=masked_heatmap)
    return heatmap


def gaussian_radius(det_size, min_overlap=0.5):
    """mmdet3d gaussian_radius transcription (CenterNet three-case radius,
    (b + sqrt)/2 roots)."""
    import math
    height, width = float(det_size[0]), float(det_size[1])

    a1 = 1
    b1 = height + width
    c1 = width * height * (1 - min_overlap) / (1 + min_overlap)
    sq1 = math.sqrt(b1 ** 2 - 4 * a1 * c1)
    r1 = (b1 + sq1) / 2

    a2 = 4
    b2 = 2 * (height + width)
    c2 = (1 - min_overlap) * width * height
    sq2 = math.sqrt(b2 ** 2 - 4 * a2 * c2)
    r2 = (b2 + sq2) / 2

    a3 = 4 * min_overlap
    b3 = -2 * min_overlap * (height + width)
    c3 = (min_overlap - 1) * width * height
    sq3 = math.sqrt(b3 ** 2 - 4 * a3 * c3)
    r3 = (b3 + sq3) / 2
    return min(r1, r2, r3)


class TorchL1Loss(nn.Module):
    """mmdet L1Loss with weight / avg_factor semantics."""

    def __init__(self, reduction='mean', loss_weight=1.0):
        super().__init__()
        self.reduction, self.loss_weight = reduction, loss_weight

    def forward(self, pred, target, weight=None, avg_factor=None):
        loss = (pred - target).abs()
        return self.loss_weight * weight_reduce_loss(
            loss, weight, self.reduction, avg_factor)


class TorchGaussianFocalLoss(nn.Module):
    """mmdet GaussianFocalLoss (CornerNet form, alpha=2 gamma=4)."""

    def __init__(self, alpha=2.0, gamma=4.0, reduction='mean',
                 loss_weight=1.0):
        super().__init__()
        self.alpha, self.gamma = alpha, gamma
        self.reduction, self.loss_weight = reduction, loss_weight

    def forward(self, pred, target, weight=None, avg_factor=None):
        eps = 1e-12
        pos_w = target.eq(1).float()
        neg_w = (1 - target).pow(self.gamma)
        loss = (-(pred + eps).log() * (1 - pred).pow(self.alpha) * pos_w
                - (1 - pred + eps).log() * pred.pow(self.alpha) * neg_w
                * (1 - pos_w))
        return self.loss_weight * weight_reduce_loss(
            loss, weight, self.reduction, avg_factor)


# --------------------------------------------------------------------- mvf
class BasicBlockOracle(nn.Module):
    """mmdet ResNet BasicBlock (conv3x3-BN-ReLU-conv3x3-BN + skip + ReLU),
    signature-compatible with the reference's import at
    pillar_mvf_encoder.py:10."""

    def __init__(self, inplanes, planes, stride=1, downsample=None,
                 norm_cfg=None, **kwargs):
        super().__init__()
        norm_cfg = norm_cfg or dict(type='BN2d', eps=1e-5, momentum=0.1)
        self.conv1 = nn.Conv2d(inplanes, planes, 3, stride=stride,
                               padding=1, bias=False)
        self.bn1 = build_norm_layer(norm_cfg, planes)[1]
        self.conv2 = nn.Conv2d(planes, planes, 3, padding=1, bias=False)
        self.bn2 = build_norm_layer(norm_cfg, planes)[1]
        self.relu = nn.ReLU(inplace=True)
        self.downsample = downsample

    def forward(self, x):
        identity = x
        out = self.relu(self.bn1(self.conv1(x)))
        out = self.bn2(self.conv2(out))
        if self.downsample is not None:
            identity = self.downsample(x)
        return self.relu(out + identity)


class TorchPointPillarsScatter(nn.Module):
    """mmdet3d PointPillarsScatter: scatter (V, C) pillar features onto a
    dense (B, C, ny, nx) canvas by (batch, z, y, x) coords."""

    def __init__(self, in_channels, output_shape):
        super().__init__()
        self.in_channels = in_channels
        self.ny, self.nx = output_shape

    def forward(self, voxel_features, coors, batch_size):
        batch_size = int(batch_size)
        canvas = voxel_features.new_zeros(
            (batch_size, self.in_channels, self.ny * self.nx))
        for b in range(batch_size):
            m = coors[:, 0] == b
            idx = (coors[m, 2].long() * self.nx + coors[m, 3].long())
            canvas[b, :, idx] = voxel_features[m].t()
        return canvas.view(batch_size, self.in_channels, self.ny, self.nx)


def build_upsample_layer(cfg, in_channels, out_channels, kernel_size,
                         stride):
    """mmcv build_upsample_layer for type='deconv'."""
    assert cfg.get('type', 'deconv') == 'deconv'
    return nn.ConvTranspose2d(in_channels, out_channels, kernel_size,
                              stride=stride, bias=cfg.get('bias', True))


def points_in_boxes_all(points, boxes):
    """mmdet3d points_in_boxes_all transcription: points (B, N, 3), boxes
    (B, T, 7) bottom-center z -> (B, N, T) 0/1 membership (yaw-rotated BEV
    rect x z slab)."""
    B, N, _ = points.shape
    out = []
    for b in range(B):
        p = points[b]                                   # (N, 3)
        bx = boxes[b]                                   # (T, 7)
        dx = p[:, None, 0] - bx[None, :, 0]
        dy = p[:, None, 1] - bx[None, :, 1]
        c, s = torch.cos(bx[:, 6]), torch.sin(bx[:, 6])
        lx = dx * c[None, :] + dy * s[None, :]
        ly = -dx * s[None, :] + dy * c[None, :]
        zin = ((p[:, None, 2] >= bx[None, :, 2])
               & (p[:, None, 2] <= bx[None, :, 2] + bx[None, :, 5]))
        inside = ((lx.abs() < bx[None, :, 3] / 2)
                  & (ly.abs() < bx[None, :, 4] / 2) & zin)
        out.append(inside.to(torch.int32))
    return torch.stack(out)


# --------------------------------------------------------------------- vsa
def furthest_point_sample(xyz, k):
    """pointnet2 FPS transcription (sampling.cu): start at index 0, greedy
    farthest; xyz (B, N, 3) -> (B, k) int32."""
    B, N, _ = xyz.shape
    out = torch.zeros(B, k, dtype=torch.int32)
    for b in range(B):
        d = torch.full((N,), 1e10)
        last = 0
        out[b, 0] = 0
        for i in range(1, k):
            d = torch.minimum(d, ((xyz[b] - xyz[b, last]) ** 2).sum(-1))
            last = int(torch.argmax(d))
            out[b, i] = last
    return out


def ball_query_stack(radius, nsample, xyz, xyz_batch_cnt, new_xyz,
                     new_xyz_batch_cnt):
    """ball_query.cu transcription on stacked batches: first nsample
    support indices (per-sample LOCAL, ascending) with d2 < r^2; pad with
    the first hit; idx[0] = -1 when empty."""
    r2 = radius * radius
    idx = torch.zeros(new_xyz.shape[0], nsample, dtype=torch.long)
    empty = torch.zeros(new_xyz.shape[0], dtype=torch.bool)
    xs = 0
    qs = 0
    for nc, mc in zip(xyz_batch_cnt.tolist(), new_xyz_batch_cnt.tolist()):
        sup = xyz[xs:xs + nc]
        for q in range(qs, qs + mc):
            d2 = ((sup - new_xyz[q]) ** 2).sum(-1)
            hits = torch.nonzero(d2 < r2).flatten()[:nsample]
            if len(hits) == 0:
                idx[q, 0] = -1
                empty[q] = True
            else:
                idx[q] = hits[0]
                idx[q, :len(hits)] = hits
        xs += nc
        qs += mc
    return idx, empty


def grouping_stack(features, features_batch_cnt, idx, idx_batch_cnt):
    """group_points.cu transcription: per-sample local idx gather ->
    (M, C, nsample)."""
    out = []
    fs = 0
    qs = 0
    for nc, mc in zip(features_batch_cnt.tolist(), idx_batch_cnt.tolist()):
        f = features[fs:fs + nc]
        loc = idx[qs:qs + mc].clamp(min=0)
        out.append(f[loc].permute(0, 2, 1))
        fs += nc
        qs += mc
    return torch.cat(out, dim=0)


class QueryAndGroupOracle(nn.Module):
    """Reference QueryAndGroup (ops/vsa/group_points.py:97-183) on the
    transcribed stack ops."""

    def __init__(self, radius, nsample, use_xyz=True):
        super().__init__()
        self.radius, self.nsample, self.use_xyz = radius, nsample, use_xyz

    def forward(self, xyz, xyz_batch_cnt, new_xyz, new_xyz_batch_cnt,
                features=None):
        idx, empty = ball_query_stack(self.radius, self.nsample, xyz,
                                      xyz_batch_cnt, new_xyz,
                                      new_xyz_batch_cnt)
        grouped_xyz = grouping_stack(xyz, xyz_batch_cnt, idx,
                                     new_xyz_batch_cnt)
        grouped_xyz = grouped_xyz - new_xyz.unsqueeze(-1)
        grouped_xyz[empty] = 0
        if features is not None:
            gf = grouping_stack(features, xyz_batch_cnt, idx,
                                new_xyz_batch_cnt)
            gf[empty] = 0
            if self.use_xyz:
                return torch.cat([grouped_xyz, gf], dim=1), idx
            return gf, idx
        return grouped_xyz, idx


# ---------------------------------------------------------------------------
# Detection-chain oracles: decode -> NMS -> select (VERDICT r2 missing #1).
# Transcribed from the reference sources cited inline; rotated IoU comes from
# the repo's numpy geometry (itself cross-checked against csrc and the
# reference's rbox_utils semantics in test_rotated_iou / test_eval_native),
# so what these oracles pin is the CHAIN protocol: top-k semantics, decode,
# score/range gating, suppression order, per-task merge.
# ---------------------------------------------------------------------------
def circle_nms_oracle(dets, thresh, post_max_size=83):
    """mmdet3d ``circle_nms`` (numba) transcription: greedy suppression by
    SQUARED center distance <= thresh, descending score order (the
    reference calls it at gd_centerpoint_head.py:264-268)."""
    import numpy as np
    x1, y1, scores = dets[:, 0], dets[:, 1], dets[:, 2]
    order = scores.argsort()[::-1].astype(np.int64)
    nd = dets.shape[0]
    suppressed = np.zeros(nd, bool)
    keep = []
    for _i in range(nd):
        i = order[_i]
        if suppressed[i]:
            continue
        keep.append(i)
        for _j in range(_i + 1, nd):
            j = order[_j]
            if suppressed[j]:
                continue
            d2 = (x1[i] - x1[j]) ** 2 + (y1[i] - y1[j]) ** 2
            if d2 <= thresh:
                suppressed[j] = True
    return np.asarray(keep[:post_max_size], np.int64)


def nms_rotated_oracle(bev5, scores, thresh, pre_max_size=None,
                       post_max_size=None):
    """mmdet3d ``nms_gpu`` protocol (iou3d_utils): sort desc, optional
    pre_max_size cut, greedy rotated-IoU suppression (suppress when
    iou > thresh), optional post_max_size cut.  Returns kept indices into
    the ORIGINAL arrays.  bev5 = (x, y, w, l, yaw)."""
    import numpy as np
    from mmdet3d_gaussian_tpu.core.evaluation.geometry_np import (
        rotated_intersection_area)
    order = scores.argsort()[::-1]
    if pre_max_size is not None:
        order = order[:pre_max_size]
    n = len(order)
    cand = bev5[order]
    area = cand[:, 2] * cand[:, 3]
    inter = rotated_intersection_area(cand, cand)
    iou = inter / np.maximum(area[:, None] + area[None, :] - inter, 1e-8)
    suppressed = np.zeros(n, bool)
    keep = []
    for a in range(n):
        if suppressed[a]:
            continue
        keep.append(order[a])
        for b in range(a + 1, n):
            if not suppressed[b] and iou[a, b] > thresh:
                suppressed[b] = True
    if post_max_size is not None:
        keep = keep[:post_max_size]
    return np.asarray(keep, np.int64)


class TorchCenterPointCoder:
    """Reference ``CenterPointBBoxCoderRev`` (+ yaw variant) transcription
    (core/bbox/coders/centerpoint_bbox_coders.py:7-112,
    centerpoint_bbox_yaw_coders.py:8-56)."""

    def __init__(self, pc_range, out_size_factor, voxel_size, code_size=9,
                 norm_bbox=True, yaw_mode=False):
        self.pc_range = pc_range
        self.out_size_factor = out_size_factor
        self.voxel_size = voxel_size
        self.code_size = code_size
        self.norm_bbox = norm_bbox
        self.yaw_mode = yaw_mode

    def _topk(self, scores, K=80):
        batch, cat, height, width = scores.size()
        topk_scores, topk_inds = torch.topk(scores.view(batch, cat, -1), K)
        topk_inds = topk_inds % (height * width)
        topk_ys = torch.div(topk_inds, width,
                            rounding_mode='floor').long()
        topk_xs = (topk_inds % width).long()
        topk_score, topk_ind = torch.topk(topk_scores.view(batch, -1), K)
        topk_clses = torch.div(topk_ind, K, rounding_mode='floor').long()
        topk_ys = topk_ys.view(batch, -1).gather(dim=1, index=topk_ind)
        topk_xs = topk_xs.view(batch, -1).gather(dim=1, index=topk_ind)
        return topk_score, topk_clses, topk_ys, topk_xs

    def select_best(self, scores, preds, topk):
        batch = scores.size(0)
        scores, clses, ys, xs = self._topk(scores, K=topk)
        locs = torch.stack((xs, ys), dim=-1)
        preds = preds.permute(0, 2, 3, 1)
        preds = torch.stack(
            [preds[b, ys[b], xs[b]] for b in range(batch)], dim=0)
        return scores, clses, locs, preds

    def decode(self, locs, preds, correct_yaw=True):
        x = (preds[..., 0] + locs[..., 0]) * self.out_size_factor * \
            self.voxel_size[0] + self.pc_range[0]
        y = (preds[..., 1] + locs[..., 1]) * self.out_size_factor * \
            self.voxel_size[1] + self.pc_range[1]
        z = preds[..., 2]
        dim = preds[..., 3:6]
        if self.norm_bbox:
            dim = dim.exp()
        if not self.yaw_mode:
            rot = torch.atan2(preds[..., 6], preds[..., 7])
            others = preds[..., 8:]
            return torch.cat((x.unsqueeze(-1), y.unsqueeze(-1),
                              z.unsqueeze(-1), dim, rot.unsqueeze(-1),
                              others), dim=-1)
        yaw = preds[..., 6]
        if correct_yaw:
            import numpy as np
            with torch.no_grad():
                dr = torch.atan2(preds[..., 7], preds[..., 8])
                num_rot90 = torch.floor((dr - yaw) / (np.pi / 2) + 0.5)
                no_swap_wh = (num_rot90.long() % 2 == 0)
            yaw = yaw + num_rot90 * (np.pi / 2)
            dim = dim.where(no_swap_wh.unsqueeze(-1), dim[..., [1, 0, 2]])
        others = preds[..., 9:]
        return torch.cat((x.unsqueeze(-1), y.unsqueeze(-1),
                          z.unsqueeze(-1), dim, yaw.unsqueeze(-1), others),
                         dim=-1)


def ref_centerhead_get_bboxes(preds_dicts, coder, num_classes_per_task,
                              test_cfg):
    """Reference ``CenterHeadRev.get_bboxes`` flow transcription
    (gd_centerpoint_head.py:218-361) for ONE sample: per-task select_best
    -> decode -> score/range gate -> circle or rotated NMS
    (get_task_detections :304-361) -> merge with z -= h/2 and label flags.

    preds_dicts: list per task of dicts of NCHW tensors (batch 1).
    Returns (boxes_np (M, code-2), scores_np, labels_np)."""
    import numpy as np
    post_center_limit_range = test_cfg.get('post_center_limit_range', None)
    max_per_img = test_cfg.get('max_per_img', 128)
    score_threshold = test_cfg.get('score_threshold', 0.1)
    rets = []
    for task_id, preds_dict in enumerate(preds_dicts):
        batch_heatmap = preds_dict['heatmap'].sigmoid()
        parts = [preds_dict['reg'], preds_dict['height'], preds_dict['dim']]
        if 'yaw' in preds_dict:
            parts += [preds_dict['yaw'], preds_dict['dir']]
        else:
            parts += [preds_dict['rot']]
        if 'vel' in preds_dict:
            parts.append(preds_dict['vel'])
        batch_pred = torch.cat(parts, dim=1)
        scores, clses, locs, preds = coder.select_best(
            batch_heatmap, batch_pred, max_per_img)
        preds = coder.decode(locs, preds)
        mask = scores.ge(score_threshold)
        if post_center_limit_range is not None:
            for i in range(3):
                mask = mask * preds[..., i].ge(
                    post_center_limit_range[i]) * preds[..., i].le(
                        post_center_limit_range[i + 3])
        boxes3d = preds[0][mask[0]]
        sc = scores[0][mask[0]]
        lb = clses[0][mask[0]]
        if test_cfg['nms_type'] == 'circle':
            dets = torch.cat([boxes3d[:, :2], sc.view(-1, 1)],
                             dim=1).numpy()
            keep = circle_nms_oracle(dets,
                                     test_cfg['min_radius'][task_id],
                                     post_max_size=test_cfg['post_max_size'])
            keep = torch.as_tensor(keep, dtype=torch.long)
        else:
            bev5 = boxes3d[:, [0, 1, 3, 4, 6]].numpy()
            keep = torch.as_tensor(
                nms_rotated_oracle(bev5, sc.numpy(),
                                   test_cfg['nms_thr'],
                                   pre_max_size=test_cfg.get('pre_max_size'),
                                   post_max_size=test_cfg.get(
                                       'post_max_size')),
                dtype=torch.long)
        rets.append(dict(bboxes=boxes3d[keep], scores=sc[keep],
                         labels=lb[keep]))
    bboxes = torch.cat([r['bboxes'] for r in rets])
    bboxes[:, 2] = bboxes[:, 2] - bboxes[:, 5] * 0.5
    scores = torch.cat([r['scores'] for r in rets])
    flag = 0
    labels = []
    for j, nc in enumerate(num_classes_per_task):
        labels.append(rets[j]['labels'] + flag)
        flag += nc
    labels = torch.cat(labels).long()
    return bboxes.numpy(), scores.numpy(), labels.numpy()


def limit_period_np(val, offset=0.5, period=3.14159265358979):
    import numpy as np
    return val - np.floor(val / period + offset) * period


def ref_anchorhead_get_bboxes(cls_score, bbox_pred, dir_pred, anchors,
                              coder, num_classes, test_cfg,
                              dir_offset=-3.14159265358979 / 2,
                              dir_limit_offset=0.0):
    """Upstream mmdet3d ``Anchor3DHead.get_bboxes_single`` +
    ``box3d_multiclass_nms`` flow the reference test path uses (the
    reference head overrides only loss; SURVEY.md §3.3): sigmoid scores,
    nms_pre cut by max score, delta decode, per-class score_thr ->
    rotated NMS on PRE-dir-correction yaw, global max_num cap, dir
    correction applied after.  One sample, single level.

    cls_score: (A, C) logits; bbox_pred (A, 7); dir_pred (A, 2);
    anchors (A, 7) — numpy."""
    import numpy as np
    scores = 1.0 / (1.0 + np.exp(-cls_score.astype(np.float64)))
    dir_scores = dir_pred.argmax(axis=-1)
    nms_pre = test_cfg.get('nms_pre', 1000)
    if nms_pre > 0 and scores.shape[0] > nms_pre:
        max_scores = scores.max(axis=1)
        topk = np.argsort(-max_scores)[:nms_pre]
        anchors = anchors[topk]
        bbox_pred = bbox_pred[topk]
        scores = scores[topk]
        dir_scores = dir_scores[topk]
    tc = TorchDeltaXYZWLHRBBoxCoder()
    boxes = tc.decode(torch.from_numpy(anchors.astype(np.float64)),
                      torch.from_numpy(bbox_pred.astype(np.float64)))
    boxes = boxes.numpy()
    bev5 = boxes[:, [0, 1, 3, 4, 6]]
    score_thr = test_cfg.get('score_thr', 0)
    out_b, out_s, out_l, out_d = [], [], [], []
    for c in range(num_classes):
        sel = scores[:, c] > score_thr
        if not sel.any():
            continue
        keep = nms_rotated_oracle(bev5[sel], scores[sel, c],
                                  test_cfg['nms_thr'])
        idx = np.where(sel)[0][keep]
        out_b.append(boxes[idx])
        out_s.append(scores[idx, c])
        out_l.append(np.full(len(idx), c, np.int64))
        out_d.append(dir_scores[idx])
    if not out_b:
        import numpy as np
        return (np.zeros((0, 7)), np.zeros((0,)), np.zeros((0,), np.int64))
    boxes = np.concatenate(out_b)
    sc = np.concatenate(out_s)
    lb = np.concatenate(out_l)
    ds = np.concatenate(out_d)
    max_num = test_cfg.get('max_num', 100)
    if len(sc) > max_num:
        order = np.argsort(-sc)[:max_num]
        boxes, sc, lb, ds = boxes[order], sc[order], lb[order], ds[order]
    dir_rot = limit_period_np(boxes[..., 6] - dir_offset,
                              dir_limit_offset, np.pi)
    boxes[..., 6] = dir_rot + dir_offset + np.pi * ds
    return boxes, sc, lb
