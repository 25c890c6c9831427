# tau=1 GWD variant (reference
# configs/waymo/hv_pointpillars_secfpn_gwd5_tau1_sbn_8x4_2x_waymo-3d-3class.py)
_base_ = './hv_pointpillars_secfpn_gwd5_sbn_8x4_2x_waymo-3d-3class.py'
head = dict(
    loss_decoded_bbox=dict(type='GDLoss', loss_type='gwd3d',
                           center_offset=(0, 0, 0.5), fun='log1p', tau=1.0,
                           loss_weight=5.0),
)
