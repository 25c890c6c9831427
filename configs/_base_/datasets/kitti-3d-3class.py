# KITTI 3-class data pipeline (reference configs/_base_/datasets/kitti-3d-3class.py)
dataset_type = 'KittiDataset'
data_root = 'data/kitti/'
class_names = ['Pedestrian', 'Cyclist', 'Car']
point_cloud_range = [0, -39.68, -3, 69.12, 39.68, 1]

db_sampler = dict(
    info_path=data_root + 'kitti_dbinfos_train.pkl',
    data_root=data_root,
    rate=1.0,
    prepare=dict(
        filter_by_difficulty=[-1],
        filter_by_min_points=dict(Car=5, Pedestrian=5, Cyclist=5)),
    classes=class_names,
    sample_groups=dict(Car=15, Pedestrian=15, Cyclist=15),
    points_loader=dict(load_dim=4, use_dim=4))

train_pipeline = [
    dict(type='LoadPointsFromFile', load_dim=4, use_dim=4),
    dict(type='ObjectSample', db_sampler=db_sampler,
         use_ground_plane=True),
    dict(type='ObjectNoise', num_try=100,
         translation_std=[1.0, 1.0, 0.0],
         global_rot_range=[0.0, 0.0],
         rot_range=[-0.78539816, 0.78539816]),
    dict(type='RandomFlip3D', flip_ratio_bev_horizontal=0.5),
    dict(type='GlobalRotScaleTrans', rot_range=[-0.78539816, 0.78539816],
         scale_ratio_range=[0.95, 1.05]),
    dict(type='PointsRangeFilter', point_cloud_range=point_cloud_range),
    dict(type='ObjectRangeFilter', point_cloud_range=point_cloud_range),
    dict(type='PointShuffle'),
    dict(type='Pad3D', num_points=20000, num_gt=64),
]
test_pipeline = [
    dict(type='LoadPointsFromFile', load_dim=4, use_dim=4),
    dict(type='PointsRangeFilter', point_cloud_range=point_cloud_range),
    dict(type='Pad3D', num_points=20000, num_gt=64),
]

data = dict(
    samples_per_gpu=6,
    train=dict(
        type='RepeatDataset', times=2,   # reference kitti bases: effective 80-epoch cyclic_40e
        dataset=dict(type=dataset_type, data_root=data_root,
               ann_file=data_root + 'kitti_infos_train.pkl',
               pipeline=train_pipeline, classes=class_names)),
    val=dict(type=dataset_type, data_root=data_root,
             ann_file=data_root + 'kitti_infos_val.pkl',
             pipeline=test_pipeline, classes=class_names, test_mode=False),
)
