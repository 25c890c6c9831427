_base_ = './hv_pointpillars_secfpn_kld5tau1_12x4_160e_kitti-3d-3class.py'
# Reference kfiou config keeps the SmoothL1 center term (kfiou3d has zero
# gradient w.r.t. xyz — it depends only on covariances) and uses fun='nlog':
# /root/reference/configs/kitti/hv_pointpillars_secfpn_kfiou5_12x4_160e_kitti-3d-3class.py
head = dict(
    loss_decoded_bbox=dict(type='GDLoss', loss_type='kfiou3d',
                           center_offset=(0, 0, 0.5), fun='nlog', tau=0.0,
                           alpha=1.0, loss_weight=5.0),
    code_weight=[1., 1., 1., 0., 0., 0., 0.],
    decode_weight=1.0,
)
