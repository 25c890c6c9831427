"""KITTI dataset (host-side), with the reference's flexible 'cowa' metric.

Re-provision of ``KittiDatasetRev``
(``/root/reference/mmdet3d_gaussian/datasets/kitti_dataset.py:8-140``):
loads mmdet3d-style info pkls, converts camera-frame annotations to LiDAR
boxes, exposes the ground plane in LiDAR frame, runs the training pipeline,
and evaluates with ``eval_map_flexible`` using the reference's per-class
thresholds (car@0.7/0.5, ped/cyc@0.5/0.25).
"""
from __future__ import annotations

import os.path as osp
import pickle
from typing import Dict, List, Optional, Sequence

import numpy as np

from ..core.evaluation.mean_ap import eval_map_flexible
from ..registry import DATASETS, PIPELINES
from .pipelines import Compose


@DATASETS.register_module()
class KittiDataset:
    CLASSES = ('Pedestrian', 'Cyclist', 'Car')

    def __init__(self, data_root: str, ann_file: str,
                 pipeline: Sequence[dict],
                 classes: Optional[Sequence[str]] = None,
                 pts_prefix: str = 'velodyne_reduced',
                 test_mode: bool = False,
                 with_plane: bool = False):
        self.data_root = data_root
        self.ann_file = ann_file
        self.pts_prefix = pts_prefix
        self.test_mode = test_mode
        self.with_plane = with_plane
        # default to the SUBCLASS's class list (WaymoDataset etc. override
        # the class attribute; an explicit `classes` arg still wins)
        self.CLASSES = tuple(classes) if classes else tuple(type(self).CLASSES)
        self.cat2label = {c: i for i, c in enumerate(self.CLASSES)}
        with open(ann_file, 'rb') as f:
            self.data_infos = pickle.load(f)
        self.pipeline = Compose(pipeline)

    def __len__(self):
        return len(self.data_infos)

    # -- annotation handling -------------------------------------------
    @staticmethod
    def _cam_to_lidar_boxes(annos: Dict, calib: Dict) -> np.ndarray:
        """KITTI camera-frame (x, y, z, l, h, w, ry) -> LiDAR
        (x, y, z, dx, dy, dz, yaw) bottom-centered boxes."""
        loc = annos['location']
        dims = annos['dimensions']      # l, h, w (camera convention)
        rots = annos['rotation_y']
        rect = calib['R0_rect'].astype(np.float32)
        trv2c = calib['Tr_velo_to_cam'].astype(np.float32)
        # camera -> lidar points
        pts = np.concatenate([loc, np.ones((len(loc), 1))], -1)
        inv = np.linalg.inv(rect @ trv2c)
        loc_l = (pts @ inv.T)[:, :3]
        l, h, w = dims[:, 0], dims[:, 1], dims[:, 2]
        yaw = -rots - np.pi / 2
        return np.stack([loc_l[:, 0], loc_l[:, 1], loc_l[:, 2],
                         l, w, h, yaw], -1).astype(np.float32)

    @staticmethod
    def _plane_to_lidar(plane: np.ndarray, calib: Dict) -> np.ndarray:
        """Ground plane cam->lidar (reference ``kitti_dataset.py:120-133``)."""
        rect = calib['R0_rect'].astype(np.float64)
        trv2c = calib['Tr_velo_to_cam'].astype(np.float64)
        mat = (rect @ trv2c).T          # transforms plane coeffs
        p = mat @ np.asarray(plane, np.float64)
        norm = np.linalg.norm(p[:3])
        return (p / norm).astype(np.float32)

    def get_ann_info(self, idx: int) -> Dict:
        info = self.data_infos[idx]
        annos = info['annos']
        keep = [i for i, n in enumerate(annos['name'])
                if n in self.cat2label]
        sub = {k: np.asarray(v)[keep] for k, v in annos.items()
               if isinstance(v, (list, np.ndarray))}
        if len(keep) == 0:
            return dict(gt_bboxes=np.zeros((0, 7), np.float32),
                        gt_labels=np.zeros((0,), np.int64), gt_attrs={})
        boxes = self._cam_to_lidar_boxes(sub, info['calib'])
        labels = np.array([self.cat2label[n] for n in sub['name']], np.int64)
        attrs = {}
        if 'difficulty' in sub:
            attrs['difficulty'] = sub['difficulty']
        if 'num_points_in_gt' in sub:
            attrs['num_points_in_gt'] = sub['num_points_in_gt']
        return dict(gt_bboxes=boxes, gt_labels=labels, gt_attrs=attrs)

    def _pts_path(self, info) -> str:
        idx = info['point_cloud']['velodyne_path'] \
            if 'point_cloud' in info else info['velodyne_path']
        base = osp.basename(idx)
        split = 'testing' if self.test_mode else 'training'
        return osp.join(self.data_root, split, self.pts_prefix, base)

    def __getitem__(self, idx: int):
        info = self.data_infos[idx]
        results = dict(pts_filename=self._pts_path(info), sample_idx=idx)
        ann = self.get_ann_info(idx)
        results['gt_bboxes'] = ann['gt_bboxes'].copy()
        results['gt_labels'] = ann['gt_labels'].copy()
        if self.with_plane and 'plane' in info:
            results['plane'] = self._plane_to_lidar(info['plane'],
                                                    info['calib'])
        return self.pipeline(results)

    # -- evaluation -----------------------------------------------------
    @staticmethod
    def lidar_det_to_kitti_anno(det: Sequence[np.ndarray], calib: Dict,
                                image_shape=(375, 1242),
                                classes: Sequence[str] = CLASSES) -> Dict:
        """Per-class LiDAR detections -> official KITTI dt anno dict.

        det: per-class list of (N, 8) [x, y, z, dx, dy, dz, yaw, score]
        bottom-centered LiDAR boxes.  Mirrors mmdet3d's
        ``KittiDataset.bbox2result_kitti`` (which the reference inherits):
        LiDAR -> rect-camera frame, 8-corner projection through P2 for the
        2D bbox, alpha from viewing angle, drop boxes behind the camera or
        fully outside the image.
        """
        rect = np.asarray(calib['R0_rect'], np.float64)
        trv2c = np.asarray(calib['Tr_velo_to_cam'], np.float64)
        p2 = np.asarray(calib['P2'], np.float64)
        tf = rect @ trv2c
        h_img, w_img = int(image_shape[0]), int(image_shape[1])

        names, trunc, occ, alphas, bboxes = [], [], [], [], []
        dims_out, locs, rys, scores = [], [], [], []
        for cls_id, cls_det in enumerate(det):
            cls_det = np.asarray(cls_det, np.float32).reshape(-1, 8)
            for row in cls_det:
                x, y, z, dx, dy, dz, yaw, score = [float(v) for v in row]
                loc_cam = tf @ np.array([x, y, z, 1.0])
                cx, cy, cz = loc_cam[:3]
                if cz <= 0:
                    continue
                l, w, h = dx, dy, dz
                ry = -yaw - np.pi / 2
                # canonical [-pi, pi)
                ry = (ry + np.pi) % (2 * np.pi) - np.pi
                # 8 corners: bottom at cy, top at cy - h (camera y down)
                xc = np.array([l, l, -l, -l, l, l, -l, -l]) / 2
                zc = np.array([w, -w, -w, w, w, -w, -w, w]) / 2
                yc = np.array([0., 0., 0., 0., -h, -h, -h, -h])
                c, s = np.cos(ry), np.sin(ry)
                cx8 = cx + c * xc + s * zc
                cz8 = cz - s * xc + c * zc
                cy8 = cy + yc
                pts = np.stack([cx8, cy8, cz8, np.ones(8)], 0)
                uvw = p2 @ pts
                uv = uvw[:2] / np.maximum(uvw[2:3], 1e-6)
                x1, y1 = uv[0].min(), uv[1].min()
                x2, y2 = uv[0].max(), uv[1].max()
                if x1 >= w_img or y1 >= h_img or x2 <= 0 or y2 <= 0:
                    continue
                bbox = [max(x1, 0.0), max(y1, 0.0),
                        min(x2, float(w_img)), min(y2, float(h_img))]
                names.append(classes[cls_id])
                trunc.append(0.0)
                occ.append(0)
                alphas.append(ry - np.arctan2(cx, cz))
                bboxes.append(bbox)
                dims_out.append([l, h, w])
                locs.append([cx, cy, cz])
                rys.append(ry)
                scores.append(score)
        n = len(names)
        return dict(
            name=np.asarray(names),
            truncated=np.asarray(trunc, np.float32),
            occluded=np.asarray(occ, np.int32),
            alpha=np.asarray(alphas, np.float32),
            bbox=np.asarray(bboxes, np.float32).reshape(n, 4),
            dimensions=np.asarray(dims_out, np.float32).reshape(n, 3),
            location=np.asarray(locs, np.float32).reshape(n, 3),
            rotation_y=np.asarray(rys, np.float32),
            score=np.asarray(scores, np.float32))

    def evaluate_kitti(self, results: List, logger=None,
                       eval_types=('bbox', 'bev', '3d')) -> Dict[str, float]:
        """Official difficulty-stratified KITTI AP (R11 + R40).

        The reference obtains these numbers through upstream mmdet3d's
        ``kitti_eval``; here they come from the native rebuild in
        ``core/evaluation/kitti_official.py``.
        """
        from ..core.evaluation.kitti_official import kitti_eval
        gt_annos, dt_annos = [], []
        for i, det in enumerate(results):
            info = self.data_infos[i]
            gt_annos.append(info['annos'])
            shape = info.get('image', {}).get('image_shape', (375, 1242))
            dt_annos.append(self.lidar_det_to_kitti_anno(
                det, info['calib'], shape, self.CLASSES))
        res, report = kitti_eval(gt_annos, dt_annos, list(self.CLASSES),
                                 eval_types=eval_types)
        if logger is None:
            print('\n' + report)
        return res

    def evaluate(self, results: List, metric: str = 'cowa',
                 logger=None, **kwargs) -> Dict[str, float]:
        """results: per frame list of per-class (N, 8) [box7, score].

        'kitti' = the official difficulty-stratified AP protocol
        (Easy/Moderate/Hard, R11+R40) — the reference's headline metric.
        'cowa' = the reference's flexible metric (``kitti_dataset.py:42-86``):
        IoU3D affinity, per-class COCO matching at [0.7, 0.5] (Car) /
        [0.5, 0.25] (Ped, Cyc).
        """
        if metric == 'kitti' or metric == ['kitti']:
            return self.evaluate_kitti(results[:len(self)], logger=logger)
        annotations = [self.get_ann_info(i) for i in range(len(self))]
        report = {}
        thrs_per_class = {'Car': (0.7, 0.5), 'Pedestrian': (0.5, 0.25),
                          'Cyclist': (0.5, 0.25)}
        all_thrs = sorted({t for v in thrs_per_class.values() for t in v},
                          reverse=True)
        rep = eval_map_flexible(
            results, annotations, match_thrs=all_thrs,
            affinity_calculator=dict(type='LidarIOU3D', z_offset=0.5),
            classes=list(self.CLASSES), logger=logger,
            report_config=[
                (f'{c}_mAP_{t}',
                 (lambda c=c, t=t: lambda k: (k['class_name'] == c
                                              and k['match_threshold'] == t
                                              and k['breakdown'] == 'All'))())
                for c in self.CLASSES
                for t in thrs_per_class.get(c, all_thrs)
            ] + [('mAP', lambda k: k['breakdown'] == 'All')])
        report.update(rep)
        return report
