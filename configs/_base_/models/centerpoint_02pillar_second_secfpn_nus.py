# nuScenes CenterPoint-pillar model (reference
# configs/_base_/models/centerpoint_02pillar_second_secfpn_nus.py):
# 0.2 m dynamic pillars over +-51.2 m, 6-task CenterHead with velocity.
voxel_size = [0.2, 0.2, 8]
point_cloud_range = [-51.2, -51.2, -5.0, 51.2, 51.2, 3.0]
model = dict(
    voxel_size=voxel_size,
    point_cloud_range=point_cloud_range,
    max_voxels_per_sample=30000,
    voxelize_mode='dynamic',
    head_type='center',
    encoder_cfg=dict(in_channels=5, feat_channels=(64,)),
    backbone_cfg=dict(in_channels=64, out_channels=(64, 128, 256),
                      layer_nums=(3, 5, 5), layer_strides=(2, 2, 2)),
    neck_cfg=dict(in_channels=(64, 128, 256), out_channels=(128, 128, 128),
                  upsample_strides=(0.5, 1, 2)),
)
head = dict(
    tasks=[dict(num_classes=1), dict(num_classes=2), dict(num_classes=2),
           dict(num_classes=1), dict(num_classes=2), dict(num_classes=2)],
    out_size_factor=4,
    with_vel=True,
    loss_cls=dict(type='GaussianFocalLoss', loss_weight=1.0),
    loss_bbox=dict(type='L1Loss', loss_weight=0.25),
    test_cfg=dict(post_center_limit_range=[-61.2, -61.2, -10, 61.2, 61.2,
                                           10],
                  max_per_img=128, score_threshold=0.1, nms_type='rotate',
                  nms_thr=0.2, post_max_size=83),
)
