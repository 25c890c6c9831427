# MVF pillars + CenterPoint head (reference
# configs/kitti/pillarmvf_centerpoint_secfpn_8x4_160e_kitti-3d-3class.py)
_base_ = ['../_base_/datasets/kitti-3d-3class.py']
voxel_size = [0.16, 0.16, 4]
point_cloud_range = [0, -39.68, -3, 69.12, 39.68, 1]
model = dict(
    voxel_size=voxel_size,
    point_cloud_range=point_cloud_range,
    max_voxels_per_sample=16000,
    voxelize_mode='mvf',
    head_type='center',
    encoder_cfg=dict(
        in_channels=4, feat_channels=64,
        views=('cartesian', 'cylindrical'),
        voxel_size=((0.16, 0.16, 4.0), (0.0038, 0.125, 71.0)),
        point_cloud_range=((0, -39.68, -3, 69.12, 39.68, 1),
                           (-0.78, -1.0, 0.0, 0.78, 3.0, 71.0)),
    ),
    backbone_cfg=dict(in_channels=64, out_channels=(64, 128, 256),
                      layer_nums=(3, 5, 5), layer_strides=(2, 2, 2)),
    neck_cfg=dict(in_channels=(64, 128, 256), out_channels=(128, 128, 128),
                  upsample_strides=(1, 2, 4)),
)
head = dict(
    tasks=[dict(num_classes=1), dict(num_classes=1), dict(num_classes=1)],
    out_size_factor=2,
    with_vel=False,
    yaw_mode=True,
    loss_gd=dict(type='GDLoss', loss_type='bd3d', fun='log1p', tau=1.0,
                 loss_weight=1.0),
    code_weights=[1.0] * 9,
    loss_cls=dict(type='GaussianFocalLoss', loss_weight=1.0),
    loss_bbox=dict(type='L1Loss', loss_weight=0.25),
    test_cfg=dict(max_per_img=128, score_threshold=0.1, nms_type='rotate',
                  nms_thr=0.2, post_max_size=83),
)
optimizer = dict(type='AdamW', lr=1e-3, betas=(0.95, 0.99),
                 weight_decay=0.01)
max_epochs = 160
