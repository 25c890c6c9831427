# nuScenes CenterPoint-pillar with GWD loss on decoded boxes (CenterGDHead).
_base_ = [
    '../_base_/models/centerpoint_02pillar_second_secfpn_nus.py',
    '../_base_/datasets/nus-3d.py',
    '../_base_/schedules/cyclic_20e.py',
    '../_base_/default_runtime.py',
]
head = dict(
    yaw_mode=True,
    loss_gd=dict(type='GDLoss', loss_type='gwd3d', fun='log1p', tau=1.0,
                 loss_weight=5.0),
    code_weights=[1.0] * 7 + [1.0, 1.0, 1.0, 0.2, 0.2],
)
