# Waymo Car(Vehicle)-only pipeline (reference configs/_base_/datasets/waymoD5-3d-car.py)
_base_ = './waymo-3d-3class.py'
class_names = ['Car']
data = dict(
    train=dict(classes=class_names),
    val=dict(classes=class_names),
    test=dict(classes=class_names))
