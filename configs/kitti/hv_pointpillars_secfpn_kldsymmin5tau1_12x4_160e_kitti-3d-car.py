# Car-only GD variant (reference
# configs/kitti/hv_pointpillars_secfpn_kldsymmin5tau1_12x4_160e_kitti-3d-car.py)
_base_ = './hv_pointpillars_secfpn_12x4_160e_kitti-3d-car.py'
head = dict(
    loss_decoded_bbox=dict(type='GDLoss', loss_type='kld3d_symmin',
                           center_offset=(0, 0, 0.5), fun='log1p', tau=1.0,
                           alpha=1.0, loss_weight=5.0),
    code_weight=[0.] * 7,
    decode_weight=1.0,
)
