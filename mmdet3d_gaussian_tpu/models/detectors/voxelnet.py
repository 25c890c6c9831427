"""Single-stage voxel detectors (PointPillars family), TPU-native assembly.

Replaces the reference detector layer
(``/root/reference/mmdet3d_gaussian/models/detectors/detectors_rev.py``,
``dynamic_centerpoint.py``): one flax module owns the learned stages
(pillar encoder -> SECOND -> FPN -> head convs); voxelization and BEV scatter
are parameter-free ops fused into the same jitted graph.  Batch samples are
flattened to a single point axis with a batch-id coord column — voxelization
of the whole batch is ONE sort + segment-reduce, not a per-sample loop
(the reference loops per sample at ``scatter.py:97-113``).

Supported modes:
  * ``hard``   — padded pillars + PillarFeatureNet (reference VoxelNet path)
  * ``dynamic``— point-level DynamicPillarFeatureNet (reference
                 DynamicCenterPoint/DynamicVoxelNet path)
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ...ops.scatter import batch_coords, build_scatter, compute_voxel_coords
from ...ops.voxelize import (CANVAS_KEY_ORDER, bev_scatter, bev_scatter_s2d,
                             bev_scatter_wfold, hard_voxelize)
from ...registry import MODELS
from ..backbones import SECOND, SECONDFPN
from ..dense_heads.anchor3d_head import Anchor3DHeadConvs
from ..dense_heads.centerpoint_head import CenterHeadConvs
from ..voxel_encoders import (DynamicPillarFeatureNet,
                              PillarFeatureNet,
                              SortedPillarFeatureNet)


@MODELS.register_module()
class PointPillarsNet(nn.Module):
    """Learned trunk: points -> BEV canvas -> SECOND -> FPN -> head maps."""
    voxel_size: Sequence[float] = (0.16, 0.16, 4.0)
    point_cloud_range: Sequence[float] = (0., -39.68, -3., 69.12, 39.68, 1.)
    max_points_per_voxel: int = 32
    max_voxels_per_sample: int = 16000
    voxelize_mode: str = 'hard'        # 'hard' | 'dynamic' | 'mvf'
    head_type: str = 'anchor'          # 'anchor' | 'center'
    encoder_cfg: Dict[str, Any] = None
    backbone_cfg: Dict[str, Any] = None
    neck_cfg: Dict[str, Any] = None
    head_cfg: Dict[str, Any] = None
    axis_name: Optional[str] = None
    compute_dtype: Optional[str] = None   # 'bfloat16' = mixed precision
                                          # (the reference's fp16 analogue;
                                          # BN/loss stay f32)
    # Space-to-depth canvas: splat pillars into (B, ny/2, nx/2, 4C) and run
    # the stride-2 first conv as the exactly-equivalent folded 2x2 conv
    # (see ops/voxelize.bev_scatter_s2d / backbones.fold_s2d_kernel).  The
    # plain (…, 64) canvas pads 64->128 lanes, costing 2x its bytes on the
    # largest tensor in the program.  'auto' = on when the dynamic path,
    # stride-2 first stage, even canvas dims and nz==1 line up.
    s2d_canvas: str = 'auto'              # 'auto' | 'on' | 'off'
    # with s2d: run stage 0 of the backbone in the W-folded layout too
    # (backbones.fold_w2_kernel) — same function, half the stage-0 HBM
    fold_w2: bool = True
    # hard-pillar encoder: 'packed' (padded (V, P, C) pillars) or 'sorted'
    # (segment ops over a rank mask — never packs the table); numerically
    # identical, same parameter tree.  MEASURED NEGATIVE (v5e, honest
    # clock, Waymo b2 bf16 hard): 'sorted' 79.8 ms vs 'packed' 65.7 —
    # killing the 4.3 ms packed gather costs ~14 ms of row-serialized
    # segment reduce/mapback over 720k points.  Default stays 'packed'.
    hard_encoder: str = 'packed'

    def _grid(self) -> Tuple[int, int]:
        pcr, vs = self.point_cloud_range, self.voxel_size
        nx = int(round((pcr[3] - pcr[0]) / vs[0]))
        ny = int(round((pcr[4] - pcr[1]) / vs[1]))
        return nx, ny

    @nn.compact
    def __call__(self, points, points_mask, train: bool = False):
        """points (B, N, C) padded; points_mask (B, N) bool.

        Returns (cls_score, bbox_pred, dir_pred) NHWC maps.
        """
        b, n, cdim = points.shape
        nx, ny = self._grid()
        max_voxels = self.max_voxels_per_sample * b

        if self.voxelize_mode == 'mvf':
            from ..mvf_encoder import PillarMVFFeatureNet
            enc_cfg = dict(self.encoder_cfg or {})
            enc_cfg.setdefault('max_voxels', max_voxels)
            encoder = PillarMVFFeatureNet(axis_name=self.axis_name,
                                          name='voxel_encoder', **enc_cfg)
            pillar_feats, coords_v, (nx, ny) = encoder(points, points_mask,
                                                       train=train)
            canvas = bev_scatter(pillar_feats, coords_v, b, nx, ny)
            backbone = SECOND(axis_name=self.axis_name, name='backbone',
                              **(self.backbone_cfg or {}))
            neck = SECONDFPN(axis_name=self.axis_name, name='neck',
                             **(self.neck_cfg or {}))
            feats = neck(backbone(canvas, train=train), train=train)
            if self.head_type == 'center':
                head = CenterHeadConvs(name='bbox_head',
                                       **(self.head_cfg or {}))
                return head(feats, train=train)
            head = Anchor3DHeadConvs(name='bbox_head',
                                     **(self.head_cfg or {}))
            return head(feats)

        flat = points.reshape(b * n, cdim)
        batch_idx = jnp.repeat(jnp.arange(b, dtype=jnp.int32), n)
        coords3, _ = compute_voxel_coords(
            flat[:, :3], self.point_cloud_range, self.voxel_size)
        # mask out padded points
        coords3 = jnp.where(points_mask.reshape(-1, 1), coords3, -1)
        coords4 = batch_coords(coords3, batch_idx)
        # (batch, ix, iy, iz) spatial extents for key linearization
        nz = max(1, int(round((self.point_cloud_range[5]
                               - self.point_cloud_range[2])
                              / self.voxel_size[2])))
        spatial = (b, nx, ny, nz)

        dt = jnp.bfloat16 if self.compute_dtype == 'bfloat16' else None
        enc_cfg = dict(self.encoder_cfg or {})
        enc_cfg.setdefault('voxel_size', self.voxel_size)
        enc_cfg.setdefault('point_cloud_range', self.point_cloud_range)

        first_stride = tuple((self.backbone_cfg or {}).get(
            'layer_strides', (2, 2, 2)))[0]
        # W-only fold for stride-1 first stages (reference Waymo config):
        # canvas (B, ny, nx/2, 2C), stage 0 fully W-folded
        use_wf = (self.s2d_canvas != 'off' and self.fold_w2
                  and first_stride == 1 and nx % 2 == 0 and nz == 1)

        if self.voxelize_mode == 'hard':
            if use_wf:
                # compact pillars in W-folded cell raster order; the
                # (b, iy, cx, parity) key is bijective with (b, ix, iy)
                iy, ix = coords4[:, 2], coords4[:, 1]
                inval = jnp.any(coords4 < 0, axis=-1)
                wf_cols = jnp.stack(
                    [coords4[:, 0], iy, ix // 2, ix & 1], axis=1)
                coords_hv = jnp.where(inval[:, None], -1, wf_cols)
                spatial_hv = (b, ny, nx // 2, 2)
                key_order_hv = None
            else:
                coords_hv, spatial_hv = coords4, spatial
                key_order_hv = CANVAS_KEY_ORDER
            if self.hard_encoder == 'sorted':
                # hard == dynamic restricted to the first max_points of
                # each voxel: run the PFN on the 360k sorted point rows
                # with a rank mask instead of packing a (V, P, C) table
                # (the packed gather at Waymo scale cost ~4.3 ms and its
                # 5-channel minor dim pads 5 -> 128 lanes in HBM)
                scatter = build_scatter(coords_hv, spatial_hv, max_voxels,
                                        key_order=key_order_hv)
                flat_sorted = jnp.take(flat, scatter.sort_order, axis=0)
                sv = scatter.sorted_view()
                seg = sv.point_voxel_ids
                pos = jnp.arange(seg.shape[0], dtype=jnp.int32)
                from ...ops.scan import cummax_i32
                firstf = jnp.concatenate([
                    jnp.ones((1,), bool), seg[1:] != seg[:-1]])
                start_pos = cummax_i32(jnp.where(firstf, pos, 0))
                rank = pos - start_pos
                kept = ((seg < max_voxels)
                        & (rank < self.max_points_per_voxel))
                kept_cnt = jnp.minimum(scatter.voxel_counts,
                                       self.max_points_per_voxel)
                encoder = SortedPillarFeatureNet(
                    axis_name=self.axis_name, dtype=dt,
                    name='voxel_encoder', **enc_cfg)
                pillar_feats = encoder(flat_sorted, sv, kept, kept_cnt,
                                       self.max_points_per_voxel,
                                       train=train)
                coords_v = scatter.voxel_coords
            else:
                # mask_slots=False: PillarFeatureNet multiplies its MLP
                # input by the slot mask (fmask), so invalid slots are
                # EXACTLY zero downstream regardless of table contents —
                # identical values, one fewer full pass over the tile-
                # padded (V, P, C) table
                hv = hard_voxelize(flat, coords_hv, spatial_hv,
                                   self.max_points_per_voxel, max_voxels,
                                   key_order=key_order_hv,
                                   mask_slots=False)
                coords_v = hv.coords
                if use_wf:
                    # reconstruct (b, ix, iy, iz=0) rows for the encoder's
                    # pillar-center decoration (folded coords encode the
                    # same cell)
                    live = jnp.all(coords_v >= 0, axis=-1)
                    enc_coords = jnp.stack(
                        [coords_v[:, 0],
                         coords_v[:, 2] * 2 + coords_v[:, 3],
                         coords_v[:, 1], jnp.zeros_like(coords_v[:, 0])],
                        axis=1)
                    enc_coords = jnp.where(live[:, None], enc_coords, -1)
                else:
                    enc_coords = coords_v
                encoder = PillarFeatureNet(axis_name=self.axis_name,
                                           dtype=dt, name='voxel_encoder',
                                           **enc_cfg)
                pillar_feats = encoder(hv.voxels, enc_coords,
                                       hv.num_points, train=train)
            use_s2d = False
        else:
            use_s2d = (self.s2d_canvas == 'on'
                       or (self.s2d_canvas == 'auto' and first_stride == 2
                           and nx % 2 == 0 and ny % 2 == 0 and nz == 1))
            if use_wf:
                iy, ix = coords4[:, 2], coords4[:, 1]
                inval = jnp.any(coords4 < 0, axis=-1)
                wf_cols = jnp.stack(
                    [coords4[:, 0], iy, ix // 2, ix & 1], axis=1)
                coords4 = jnp.where(inval[:, None], -1, wf_cols)
                spatial = (b, ny, nx // 2, 2)
                key_order = None
                use_s2d = False
            elif use_s2d:
                # compact voxels in s2d CELL raster order (parity minor):
                # the splat's segment ids are then non-decreasing and the
                # (b, cy, cx, parity) key is still bijective with pillars
                iy, ix = coords4[:, 2], coords4[:, 1]
                inval = jnp.any(coords4 < 0, axis=-1)
                s2d_cols = jnp.stack(
                    [coords4[:, 0], iy // 2, ix // 2,
                     (iy & 1) * 2 + (ix & 1)], axis=1)
                coords4 = jnp.where(inval[:, None], -1, s2d_cols)
                spatial = (b, ny // 2, nx // 2, 4)
                key_order = None
            else:
                key_order = CANVAS_KEY_ORDER
            scatter = build_scatter(coords4, spatial, max_voxels,
                                    key_order=key_order)
            # permute points into voxel-sorted order once: every segment
            # reduce / mapback in the encoder then runs on XLA's sorted
            # lowering (Scatter.sorted_view); voxel-level outputs identical
            flat_sorted = jnp.take(flat, scatter.sort_order, axis=0)
            encoder = DynamicPillarFeatureNet(axis_name=self.axis_name,
                                              name='voxel_encoder', **enc_cfg)
            pillar_feats = encoder(flat_sorted, scatter.sorted_view(),
                                   train=train)
            coords_v = scatter.voxel_coords

        # Cast BEFORE the splat: every live canvas cell receives exactly one
        # voxel row (build_scatter dedups), so bf16-casting pillar rows first
        # is bit-identical to casting the canvas after — but the splat then
        # writes/reads half the bytes on the largest tensor in the program
        # (f32[B*ny*nx+1, C] = 219 MB at KITTI b4), and the backward canvas
        # gradient + its conv-layout relayout copy halve too.
        if dt is not None:
            pillar_feats = pillar_feats.astype(dt)
        chunk_h = 1
        if use_wf:
            canvas = bev_scatter_wfold(pillar_feats, coords_v, b,
                                       nx // 2, ny, indices_sorted=True)
            # H-chunk stage 0 into the batch dim: the conv emitter packs
            # batch into the 8 sublanes, so at B=2 the stage-0 convs use
            # 1/4 of the MXU width (65 vs 210 TFLOP/s measured on v5e).
            # The chunk split is a pure bitcast of the splat's flat
            # raster; halo rows are exchanged per conv (backbones.py).
            for k in (4, 2):
                if ny % k == 0 and b * k <= 8:
                    chunk_h = k
                    break
            if chunk_h > 1:
                canvas = canvas.reshape(b * chunk_h, ny // chunk_h,
                                        nx // 2, canvas.shape[-1])
        elif use_s2d:
            canvas = bev_scatter_s2d(pillar_feats, coords_v, b,
                                     nx // 2, ny // 2, indices_sorted=True)
        else:
            canvas = bev_scatter(pillar_feats, coords_v, b, nx, ny,
                                 indices_sorted=True)

        backbone = SECOND(axis_name=self.axis_name, dtype=dt,
                          input_s2d=use_s2d,
                          fold_w2=use_s2d and self.fold_w2 and nx % 4 == 0,
                          input_wfold=use_wf, chunk_h=chunk_h,
                          name='backbone', **(self.backbone_cfg or {}))
        neck_kw = dict(self.neck_cfg or {})
        if self.head_type != 'center':
            # anchor head is a pure 1x1 conv — consume the branch list and
            # skip the neck concat (see SECONDFPN.concat_out)
            neck_kw.setdefault('concat_out', False)
        neck = SECONDFPN(axis_name=self.axis_name, dtype=dt, name='neck',
                         **neck_kw)
        feats = neck(backbone(canvas, train=train), train=train)

        if self.head_type == 'center':
            head = CenterHeadConvs(name='bbox_head', dtype=dt,
                                   **(self.head_cfg or {}))
            return head(feats, train=train)
        head = Anchor3DHeadConvs(name='bbox_head', dtype=dt,
                                 **(self.head_cfg or {}))
        return head(feats)
