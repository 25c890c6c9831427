# Car-only PointPillars baseline (reference
# configs/kitti/hv_pointpillars_secfpn_6x8_160e_kitti-3d-car.py).
# NOTE size order: this repo uses (dx, dy, dz) anchor sizes throughout —
# the reference car config's [1.6, 3.9, 1.56] is the older (w, l, h) order
# of the same Car anchor.
_base_ = [
    '../_base_/models/hv_pointpillars_secfpn_kitti.py',
    '../_base_/datasets/kitti-3d-car.py',
    '../_base_/schedules/cyclic_40e.py',
]
model = dict(head_cfg=dict(num_classes=1, num_anchors=2))
head = dict(
    num_classes=1,
    anchor_generator=dict(
        ranges=[[0, -39.68, -1.78, 69.12, 39.68, -1.78]],
        sizes=[[3.9, 1.6, 1.56]],
        rotations=[0.0, 1.57],
    ),
    assigners=[dict(pos_iou_thr=0.6, neg_iou_thr=0.45, min_pos_iou=0.45)],
    loss_decoded_bbox=None,
    code_weight=[1.] * 7,
    decode_weight=None,
)
data = dict(samples_per_gpu=6)
optimizer = dict(lr=0.0018)
