# MVF pillars + Bhattacharyya GD loss (reference
# configs/kitti/pillarmvf_pointpillars_secfpn_bd5tau1_8x4_160e_kitti-3d-3class.py)
_base_ = './pillarmvf_pointpillars_secfpn_8x4_160e_kitti-3d-3class.py'
head = dict(
    loss_decoded_bbox=dict(type='GDLoss', loss_type='bd3d',
                           center_offset=(0, 0, 0.5), fun='log1p', tau=1.0,
                           alpha=1.0, loss_weight=5.0),
    code_weight=[0.] * 7,
    decode_weight=1.0,
)
data = dict(samples_per_gpu=8)
optimizer = dict(lr=0.00075)
