"""GT-database copy-paste sampler (host-side NumPy).

Re-provision of the reference ``DataBaseSamplerRev``
(``/root/reference/mmdet3d_gaussian/datasets/pipelines/dbsampler.py:11-151``):
class-balanced sampling up to per-class quotas, BEV collision avoidance
against existing + already-sampled boxes, per-object point patches translated
to the sampled pose, optional ground-plane z-snap.  The db_infos dict is
filtered once (difficulty / min-points) and can be shared across dataloader
worker processes via :class:`SharedDictOfList` (``mem_util.py``).
"""
from __future__ import annotations

import os.path as osp
import pickle
from typing import Dict, List, Optional, Sequence

import numpy as np

from .mem_util import SharedDictOfList


class BatchSampler:
    """Shuffled epoch-cycling sampler over one class's db infos."""

    def __init__(self, infos: Sequence, shuffle: bool = True,
                 seed: Optional[int] = None):
        self.infos = infos
        self.shuffle = shuffle
        self.rng = np.random.RandomState(seed)
        self._indices = np.arange(len(infos))
        if shuffle:
            self.rng.shuffle(self._indices)
        self._pos = 0

    def sample(self, num: int) -> List:
        if len(self.infos) == 0:
            return []
        out = []
        for _ in range(num):
            if self._pos >= len(self._indices):
                if self.shuffle:
                    self.rng.shuffle(self._indices)
                self._pos = 0
            out.append(self.infos[int(self._indices[self._pos])])
            self._pos += 1
        return out


def _boxes_collide_bev(boxes1: np.ndarray, boxes2: np.ndarray) -> np.ndarray:
    """(N, 7) x (M, 7) -> (N, M) bool rotated-BEV overlap test."""
    if len(boxes1) == 0 or len(boxes2) == 0:
        return np.zeros((len(boxes1), len(boxes2)), bool)
    from ..core.evaluation.geometry_np import rotated_intersection_area
    b1 = np.c_[boxes1[:, 0:2], boxes1[:, 3:5], boxes1[:, 6:7]]
    b2 = np.c_[boxes2[:, 0:2], boxes2[:, 3:5], boxes2[:, 6:7]]
    return rotated_intersection_area(b1, b2) > 1e-6


class DataBaseSampler:
    def __init__(self, info_path: str, data_root: str, rate: float,
                 prepare: Dict, sample_groups: Dict[str, int],
                 classes: Sequence[str], points_loader: Optional[dict] = None,
                 use_shared_memory: bool = False,
                 seed: Optional[int] = None):
        self.data_root = data_root
        self.rate = rate
        self.classes = list(classes)
        self.cat2label = {name: i for i, name in enumerate(classes)}

        with open(info_path, 'rb') as f:
            db_infos = pickle.load(f)
        for prep_func, val in (prepare or {}).items():
            db_infos = getattr(self, prep_func)(db_infos, val)
        if use_shared_memory:
            db_infos = SharedDictOfList(db_infos)
        self.db_infos = db_infos

        self.sample_classes = list(sample_groups.keys())
        self.sample_max_nums = [int(v) for v in sample_groups.values()]
        self.sampler_dict = {
            k: BatchSampler(self.db_infos[k], seed=seed)
            for k in self.db_infos.keys()}
        from .pipelines import LoadPointsFromFile
        pl_cfg = dict(points_loader or {})
        pl_cfg.pop('type', None)
        pl_cfg.pop('coord_type', None)
        self.points_loader = LoadPointsFromFile(**pl_cfg)

    # -- db filters (mmdet3d names so configs carry over) ---------------
    @staticmethod
    def filter_by_difficulty(db_infos, removed_difficulty):
        return {k: [i for i in v
                    if i.get('difficulty', 0) not in removed_difficulty]
                for k, v in db_infos.items()}

    @staticmethod
    def filter_by_min_points(db_infos, min_gt_points_dict):
        out = {}
        for k, v in db_infos.items():
            thr = int(min_gt_points_dict.get(k, 0))
            out[k] = [i for i in v if i.get('num_points_in_gt', thr) >= thr]
        return out

    # -------------------------------------------------------------------
    def sample_class_v2(self, name: str, num: int,
                        gt_bboxes: np.ndarray) -> List:
        sampled = self.sampler_dict[name].sample(num) \
            if name in self.sampler_dict else []
        if not sampled:
            return []
        boxes = np.stack([s['box3d_lidar'] for s in sampled], 0)
        # collision among new boxes and against existing
        coll_exist = _boxes_collide_bev(boxes, gt_bboxes).any(-1)
        coll_self = _boxes_collide_bev(boxes, boxes)
        np.fill_diagonal(coll_self, False)
        keep = []
        taken = np.zeros(len(boxes), bool)
        for i in range(len(boxes)):
            if coll_exist[i] or (coll_self[i] & taken).any():
                continue
            taken[i] = True
            keep.append(sampled[i])
        return keep

    def sample_all(self, gt_bboxes: np.ndarray, gt_labels: np.ndarray,
                   img=None, ground_plane=None) -> Optional[Dict]:
        sampled, sampled_boxes = [], []
        gt = np.asarray(gt_bboxes, np.float32)
        # boxes may carry velocity columns (nuScenes 9-dim); collisions only
        # need the 7 geometric dims
        avoid = gt[:, :7] if gt.size else np.zeros((0, 7), np.float32)
        for name, max_num in zip(self.sample_classes, self.sample_max_nums):
            label = self.cat2label[name]
            want = int(np.round(self.rate * (max_num
                                             - int((gt_labels
                                                    == label).sum()))))
            if want <= 0:
                continue
            cls_sampled = self.sample_class_v2(name, want, avoid)
            if cls_sampled:
                boxes = np.stack([s['box3d_lidar'] for s in cls_sampled], 0)
                sampled += cls_sampled
                sampled_boxes.append(boxes[:, :7])
                avoid = np.concatenate([avoid, boxes[:, :7]], 0)

        if not sampled:
            return None
        boxes = np.concatenate(sampled_boxes, 0).astype(np.float32)
        labels = np.array([self.cat2label[s['name']] for s in sampled],
                          np.int64)

        pts_list = []
        for info in sampled:
            path = osp.join(self.data_root, info['path']) \
                if self.data_root else info['path']
            pts = self.points_loader(dict(pts_filename=path))['points']
            pts = pts.copy()
            pts[:, :3] += np.asarray(info['box3d_lidar'][:3], np.float32)
            pts_list.append(pts)

        if ground_plane is not None:
            # snap sampled boxes (and their points) onto the plane
            # (reference :131-137)
            xyz = boxes[:, :3]
            dz = (np.asarray(ground_plane[:3])[None] * xyz).sum(-1) \
                + ground_plane[3]
            boxes[:, 2] -= dz
            for i in range(len(pts_list)):
                pts_list[i][:, 2] -= dz[i]

        return dict(gt_bboxes=boxes, gt_labels=labels,
                    points=np.concatenate(pts_list, 0))
