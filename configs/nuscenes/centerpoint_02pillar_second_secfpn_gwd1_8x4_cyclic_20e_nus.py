# CenterGDHead with GWD at weight 1, tau=0 (reference
# configs/nuscenes/centerpoint_02pillar_second_secfpn_gwd1_8x4_cyclic_20e_nus.py)
_base_ = './centerpoint_02pillar_second_secfpn_gwd5_8x4_cyclic_20e_nus.py'
head = dict(
    loss_gd=dict(type='GDLoss', loss_type='gwd3d', fun='log1p', tau=0.0,
                 loss_weight=1.0),
)
