# Waymo full-range PointPillars model (reference
# configs/_base_/models/hv_pointpillars_secfpn_waymo.py): hard voxelize,
# 0.32 m pillars over +-74.88 m, stride-1 first stage, aligned anchors with
# per-class z.  SyncBN comes free: BN uses axis_name psum when the model is
# built with axis_name='data'.
voxel_size = [0.32, 0.32, 6]
point_cloud_range = [-74.88, -74.88, -2, 74.88, 74.88, 4]
model = dict(
    voxel_size=voxel_size,
    point_cloud_range=point_cloud_range,
    max_points_per_voxel=32,
    max_voxels_per_sample=32000,
    voxelize_mode='hard',
    encoder_cfg=dict(in_channels=5, feat_channels=(64,)),
    backbone_cfg=dict(in_channels=64, out_channels=(64, 128, 256),
                      layer_nums=(3, 5, 5), layer_strides=(1, 2, 2)),
    neck_cfg=dict(in_channels=(64, 128, 256), out_channels=(128, 128, 128),
                  upsample_strides=(1, 2, 4)),
    head_cfg=dict(num_classes=3, num_anchors=6, feat_channels=384),
)
head = dict(
    num_classes=3,
    anchor_generator=dict(
        # reference AlignedAnchor3DRangeGenerator with per-class z
        # (hv_pointpillars_secfpn_waymo.py:46-57): car -0.0345,
        # pedestrian 0, cyclist -0.1188 (rows follow our class order)
        aligned=True,
        ranges=[[-74.88, -74.88, -0.0345, 74.88, 74.88, -0.0345],
                [-74.88, -74.88, 0.0, 74.88, 74.88, 0.0],
                [-74.88, -74.88, -0.1188, 74.88, 74.88, -0.1188]],
        sizes=[[4.73, 2.08, 1.77], [0.91, 0.84, 1.74], [1.81, 0.84, 1.77]],
        rotations=[0.0, 1.57],
    ),
    assigners=[
        dict(pos_iou_thr=0.55, neg_iou_thr=0.4, min_pos_iou=0.4),
        dict(pos_iou_thr=0.5, neg_iou_thr=0.3, min_pos_iou=0.3),
        dict(pos_iou_thr=0.5, neg_iou_thr=0.3, min_pos_iou=0.3),
    ],
    loss_cls=dict(type='FocalLoss', use_sigmoid=True, gamma=2.0, alpha=0.25,
                  loss_weight=1.0),
    loss_bbox=dict(type='SmoothL1Loss', beta=1.0 / 9.0, loss_weight=2.0),
    loss_dir=dict(type='CrossEntropyLoss', use_sigmoid=False,
                  loss_weight=0.2),
    test_cfg=dict(use_rotate_nms=True, nms_thr=0.25, score_thr=0.1,
                  nms_pre=1024, max_num=256),
)
