# Multi-view-fusion pillar encoder variant (cartesian + cylindrical views).
_base_ = './hv_pointpillars_secfpn_kld5tau1_12x4_160e_kitti-3d-3class.py'
model = dict(
    voxelize_mode='mvf',
    encoder_cfg=dict(
        in_channels=4, feat_channels=64,
        views=('cartesian', 'cylindrical'),
        voxel_size=((0.16, 0.16, 4.0), (0.0038, 0.125, 71.0)),
        point_cloud_range=((0, -39.68, -3, 69.12, 39.68, 1),
                           (-0.78, -1.0, 0.0, 0.78, 3.0, 71.0)),
    ),
)
