# KITTI Car-only data pipeline (reference configs/_base_/datasets/kitti-3d-car.py)
_base_ = './kitti-3d-3class.py'
class_names = ['Car']

db_sampler = dict(
    prepare=dict(_delete_=True, filter_by_difficulty=[-1],
                 filter_by_min_points=dict(Car=5)),
    classes=class_names,
    sample_groups=dict(_delete_=True, Car=15))

data = dict(
    train=dict(classes=class_names),
    val=dict(classes=class_names),
    test=dict(classes=class_names))
