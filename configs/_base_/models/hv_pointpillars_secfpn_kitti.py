# PointPillars + SECOND/SECONDFPN + GD anchor head, KITTI 3-class.
# TPU counterpart of reference configs/_base_/models/hv_pointpillars_secfpn_kitti.py
voxel_size = [0.16, 0.16, 4]
point_cloud_range = [0, -39.68, -3, 69.12, 39.68, 1]

model = dict(
    voxel_size=voxel_size,
    point_cloud_range=point_cloud_range,
    max_points_per_voxel=32,
    max_voxels_per_sample=16000,
    voxelize_mode='hard',
    encoder_cfg=dict(in_channels=4, feat_channels=(64,)),
    backbone_cfg=dict(in_channels=64, out_channels=(64, 128, 256),
                      layer_nums=(3, 5, 5), layer_strides=(2, 2, 2)),
    neck_cfg=dict(in_channels=(64, 128, 256), out_channels=(128, 128, 128),
                  upsample_strides=(1, 2, 4)),
    head_cfg=dict(num_classes=3, num_anchors=6, feat_channels=384),
)

head = dict(
    num_classes=3,
    anchor_generator=dict(
        ranges=[
            [0.08, -39.60, -0.6, 68.88, 39.44, -0.6],
            [0.08, -39.60, -0.6, 68.88, 39.44, -0.6],
            [0.08, -39.60, -1.78, 68.88, 39.44, -1.78],
        ],
        sizes=[[0.8, 0.6, 1.73], [1.76, 0.6, 1.73], [3.9, 1.6, 1.56]],
        rotations=[0.0, 1.57],
    ),
    assigners=[
        dict(pos_iou_thr=0.5, neg_iou_thr=0.35, min_pos_iou=0.35),
        dict(pos_iou_thr=0.5, neg_iou_thr=0.35, min_pos_iou=0.35),
        dict(pos_iou_thr=0.6, neg_iou_thr=0.45, min_pos_iou=0.45),
    ],
    loss_cls=dict(type='FocalLoss', use_sigmoid=True, gamma=2.0, alpha=0.25,
                  loss_weight=1.0),
    loss_bbox=dict(type='SmoothL1Loss', beta=1.0 / 9.0, loss_weight=2.0),
    loss_dir=dict(type='CrossEntropyLoss', use_sigmoid=False, loss_weight=0.2),
    test_cfg=dict(use_rotate_nms=True, nms_thr=0.01, score_thr=0.05,
                  nms_pre=1024, max_num=100),
)
