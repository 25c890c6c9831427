"""Official KITTI AP protocol tests (core/evaluation/kitti_official.py).

Covers: native C++ vs NumPy statistics parity, perfect-prediction AP=100,
difficulty gating, neighbouring-class / DontCare ignore semantics, and the
R11/R40 protocol arithmetic.
"""
import numpy as np
import pytest

from mmdet3d_gaussian_tpu.core.evaluation import kitti_official as K
from mmdet3d_gaussian_tpu.core.evaluation import native


def _anno(boxes_cam, names, scores=None, bbox=None, trunc=None, occ=None):
    n = len(names)
    boxes_cam = np.asarray(boxes_cam, np.float32).reshape(n, 7)
    out = dict(
        name=np.asarray(names),
        location=boxes_cam[:, :3],
        dimensions=boxes_cam[:, 3:6],
        rotation_y=boxes_cam[:, 6],
        bbox=np.asarray(bbox, np.float32).reshape(n, 4) if bbox is not None
        else np.tile(np.array([0., 0., 100., 50.], np.float32), (n, 1)),
        truncated=np.zeros(n, np.float32) if trunc is None
        else np.asarray(trunc, np.float32),
        occluded=np.zeros(n, np.int32) if occ is None
        else np.asarray(occ, np.int32),
    )
    if scores is not None:
        out['score'] = np.asarray(scores, np.float32)
    return out


def _rand_cam_boxes(rng, n, spread=20.0):
    loc = rng.uniform(-spread, spread, (n, 3)).astype(np.float32)
    loc[:, 1] = rng.uniform(0.5, 2.0, n)
    dims = rng.uniform(1.0, 4.0, (n, 3)).astype(np.float32)
    rot = rng.uniform(-np.pi, np.pi, n).astype(np.float32)
    return np.concatenate([loc, dims, rot[:, None]], -1)


# ---------------------------------------------------------------------------
# native vs numpy statistics parity
# ---------------------------------------------------------------------------
@pytest.mark.skipif(not native.available(), reason='no native toolchain')
def test_stats_native_matches_numpy():
    rng = np.random.default_rng(0)
    for trial in range(20):
        nd, ng = rng.integers(0, 12, 2)
        overlaps = rng.uniform(0, 1, (nd, ng)).astype(np.float32)
        scores = rng.uniform(0, 1, nd).astype(np.float32)
        ig_det = rng.integers(-1, 2, nd).astype(np.int8)
        ig_gt = rng.integers(-1, 2, ng).astype(np.int8)
        ndc = int(rng.integers(0, 3))
        dc = rng.uniform(0, 1, (nd, ndc)).astype(np.float32)
        min_ov = 0.5
        thrs = np.sort(rng.uniform(0, 1, 5).astype(np.float32))[::-1]

        got = K._stats(overlaps, scores, ig_det, ig_gt, dc, min_ov, thrs)
        want = np.asarray(
            [K._stats_one_np(overlaps, scores, ig_det, ig_gt, dc, min_ov,
                             t, True)[:3] for t in thrs], np.int64)
        np.testing.assert_array_equal(got, want, err_msg=f'trial {trial}')

        lib = native._load()
        out = np.empty(max(ng, 1), np.float32)
        n = lib.kitti_tp_scores(
            np.ascontiguousarray(overlaps), scores, ig_det, nd, ig_gt, ng,
            min_ov, out)
        want_sc = K._stats_one_np(overlaps, scores, ig_det, ig_gt, None,
                                  min_ov, 0.0, False)[3]
        np.testing.assert_allclose(out[:n], want_sc)


# ---------------------------------------------------------------------------
# geometry
# ---------------------------------------------------------------------------
def test_image_box_overlap():
    a = np.array([[0, 0, 2, 2]], np.float32)
    b = np.array([[1, 1, 3, 3], [0, 0, 2, 2], [5, 5, 6, 6]], np.float32)
    iou = K.image_box_overlap(a, b)
    np.testing.assert_allclose(iou[0], [1 / 7, 1.0, 0.0], atol=1e-6)
    ratio = K.image_box_overlap(a, b, criterion=0)
    np.testing.assert_allclose(ratio[0], [0.25, 1.0, 0.0], atol=1e-6)


def test_d3_overlap_identity_and_disjoint():
    boxes = np.array([[0, 1.5, 10, 4, 1.5, 2, 0.3]], np.float32)
    same = K.d3_box_overlap(boxes, boxes)
    np.testing.assert_allclose(same, [[1.0]], atol=1e-5)
    far = boxes.copy()
    far[0, 0] += 100
    np.testing.assert_allclose(K.d3_box_overlap(boxes, far), [[0.0]],
                               atol=1e-7)
    # height-disjoint: same BEV, no vertical overlap
    up = boxes.copy()
    up[0, 1] += 10
    np.testing.assert_allclose(K.d3_box_overlap(boxes, up), [[0.0]],
                               atol=1e-7)


# ---------------------------------------------------------------------------
# protocol semantics
# ---------------------------------------------------------------------------
def test_clean_data_difficulty_and_neighbors():
    gt = _anno(np.zeros((4, 7)), ['Car', 'Car', 'Van', 'DontCare'],
               bbox=[[0, 0, 10, 50], [0, 0, 10, 30], [0, 0, 10, 50],
                     [0, 0, 10, 50]],
               occ=[0, 0, 0, 0])
    dt = _anno(np.zeros((2, 7)), ['Car', 'Pedestrian'], scores=[0.9, 0.8],
               bbox=[[0, 0, 10, 50], [0, 0, 10, 50]])
    # easy: second gt (height 30 < 40) ignored
    nvalid, ig_gt, ig_dt, dc = K.clean_data(gt, dt, 0, 0)
    assert nvalid == 1
    assert list(ig_gt) == [0, 1, 1, -1]     # van -> ignore, dontcare -> -1
    assert list(ig_dt) == [0, -1]
    assert dc.shape == (1, 4)
    # moderate: height 30 >= 25 -> valid
    nvalid, ig_gt, _, _ = K.clean_data(gt, dt, 0, 1)
    assert nvalid == 2 and list(ig_gt)[:2] == [0, 0]


def test_get_thresholds_spacing():
    scores = np.linspace(1, 0, 100)
    thr = K.get_thresholds(scores, num_gt=100)
    assert len(thr) == 41
    assert thr[0] == scores[0]
    # roughly every 2.5 recall points
    assert np.all(np.diff(thr) < 0)


def test_perfect_predictions_ap100():
    # Enough detections (200 >> 41 recall positions) that a perfect
    # detector saturates every recall sample -> AP exactly 100.
    rng = np.random.default_rng(1)
    gts, dts = [], []
    for _ in range(40):
        boxes = _rand_cam_boxes(rng, 5, spread=40.0)
        names = ['Car'] * 5
        gts.append(_anno(boxes, names))
        dts.append(_anno(boxes, names, scores=rng.uniform(0.5, 1.0, 5)))
    res, report = K.kitti_eval(gts, dts, ['Car'], eval_types=('bev', '3d'))
    for et in ('bev', '3d'):
        assert res[f'Car_{et}_moderate_strict_AP11'] == pytest.approx(
            100.0, abs=1e-3)
        assert res[f'Car_{et}_moderate_strict_AP40'] == pytest.approx(
            100.0, abs=1e-3)
    assert 'Car AP@0.70/0.70/0.70:' in report
    assert '| 3D AP |' in report


def test_false_positives_reduce_ap():
    rng = np.random.default_rng(2)
    gts, dts = [], []
    for _ in range(40):
        boxes = _rand_cam_boxes(rng, 3, spread=40.0)
        gts.append(_anno(boxes, ['Car'] * 3))
        # perfect dets + 2 HIGHER-scoring far-away FPs per frame
        fp = _rand_cam_boxes(rng, 2) + np.array([500, 0, 500, 0, 0, 0, 0],
                                                np.float32)
        det_boxes = np.concatenate([boxes, fp], 0)
        dts.append(_anno(det_boxes, ['Car'] * 5,
                         scores=np.concatenate(
                             [rng.uniform(0.3, 0.6, 3),
                              rng.uniform(0.9, 1.0, 2)])))
    res, _ = K.kitti_eval(gts, dts, ['Car'], eval_types=('3d',))
    ap = res['Car_3d_moderate_strict_AP40']
    assert 0.0 < ap < 80.0


def test_dontcare_absorbs_fp():
    # A high-scoring det inside a DontCare region must not count as FP on
    # the bbox metric; with the DontCare row removed it must.
    car_box = np.array([[0, 1.5, 10, 4, 1.5, 2, 0.0]], np.float32)
    gt_dc = _anno(np.concatenate([car_box, car_box], 0),
                  ['Car', 'DontCare'],
                  bbox=[[0, 0, 100, 50], [200, 0, 300, 50]])
    gt_plain = _anno(car_box, ['Car'], bbox=[[0, 0, 100, 50]])
    dt = _anno(np.concatenate([car_box, car_box + 50], 0), ['Car', 'Car'],
               scores=[0.9, 0.99],
               bbox=[[0, 0, 100, 50], [210, 0, 290, 45]])
    with_dc, _ = K.kitti_eval([gt_dc], [dt], ['Car'], eval_types=('bbox',))
    without, _ = K.kitti_eval([gt_plain], [dt], ['Car'],
                              eval_types=('bbox',))
    k = 'Car_bbox_moderate_strict_AP11'
    # absorbed: tp=1 fp=0 at the single threshold; unabsorbed: fp=1.
    assert with_dc[k] == pytest.approx(100.0 / 11, abs=1e-3)
    assert without[k] == pytest.approx(50.0 / 11, abs=1e-3)


def test_difficulty_stratification_end_to_end():
    # Per frame: one easy gt + one occluded (hard-only) gt; dets match only
    # the easy ones.  Easy AP -> 100; hard AP ~ 54 (recall caps at 0.5).
    rng = np.random.default_rng(3)
    gts, dts = [], []
    for _ in range(100):
        boxes = _rand_cam_boxes(rng, 2, spread=40.0)
        gts.append(_anno(boxes, ['Car', 'Car'], occ=[0, 2]))
        dts.append(_anno(boxes[:1], ['Car'],
                         scores=rng.uniform(0.5, 1.0, 1)))
    res, _ = K.kitti_eval(gts, dts, ['Car'], eval_types=('3d',))
    assert res['Car_3d_easy_strict_AP11'] == pytest.approx(100.0, abs=1e-3)
    hard = res['Car_3d_hard_strict_AP11']
    assert 40.0 < hard < 60.0


def test_dataset_roundtrip_perfect_detector(tmp_path):
    """KittiDataset.evaluate(metric='kitti') end to end: camera gt annos ->
    lidar boxes -> det -> camera dt annos -> AP 100 with a realistic calib.
    Also checks the lidar->camera conversion round-trips the gt geometry."""
    import pickle
    from mmdet3d_gaussian_tpu.datasets.kitti import KittiDataset

    rng = np.random.default_rng(7)
    # realistic KITTI-ish calib: cam x=right, y=down, z=fwd; lidar x=fwd
    trv2c = np.array([[0, -1, 0, 0], [0, 0, -1, -0.08],
                      [1, 0, 0, -0.27], [0, 0, 0, 1]], np.float64)
    calib = dict(R0_rect=np.eye(4), Tr_velo_to_cam=trv2c,
                 P2=np.array([[720., 0., 620., 45.],
                              [0., 720., 175., 0.],
                              [0., 0., 1., 0.]]))
    infos = []
    num_frames = 60
    for i in range(num_frames):
        n = 4
        # camera-frame gts in front of the camera
        # keep depth <= 22 m so the projected 2D height stays above the
        # 40 px 'easy' det gate, and x narrow enough to stay in-image
        loc = np.c_[rng.uniform(-4, 4, n), rng.uniform(1.4, 1.8, n),
                    rng.uniform(10, 22, n)]
        dims = np.tile([3.9, 1.56, 1.6], (n, 1)) \
            + rng.uniform(-0.1, 0.1, (n, 3))
        ry = rng.uniform(-np.pi, np.pi, n)
        # 2D bbox tall enough for 'easy' (projected height irrelevant here;
        # the protocol uses the LABEL bbox for gt gating)
        annos = dict(name=np.array(['Car'] * n),
                     location=loc, dimensions=dims, rotation_y=ry,
                     bbox=np.tile([100., 100., 400., 300.], (n, 1)),
                     occluded=np.zeros(n, np.int32),
                     truncated=np.zeros(n, np.float32))
        infos.append(dict(
            point_cloud=dict(velodyne_path=f'training/velodyne/{i}.bin'),
            calib=calib, image=dict(image_shape=np.array([375, 1242])),
            annos=annos))
    ann_file = tmp_path / 'infos.pkl'
    with open(ann_file, 'wb') as f:
        pickle.dump(infos, f)
    ds = KittiDataset(str(tmp_path), str(ann_file), pipeline=[],
                      classes=['Car'])

    # perfect detector: det lidar boxes straight from gt conversion
    results = []
    for i in range(num_frames):
        ann = ds.get_ann_info(i)
        det = np.concatenate(
            [ann['gt_bboxes'],
             rng.uniform(0.3, 1.0, (len(ann['gt_bboxes']), 1))],
            -1).astype(np.float32)
        results.append([det])
    res = ds.evaluate(results, metric='kitti')
    assert res['Car_3d_moderate_strict_AP40'] > 99.0
    assert res['Car_bev_easy_strict_AP40'] > 99.0

    # geometric round trip: lidar det -> kitti anno reproduces camera gt
    dt = KittiDataset.lidar_det_to_kitti_anno(
        results[0], calib, (375, 1242), ('Car',))
    gt = infos[0]['annos']
    assert len(dt['name']) == len(gt['name'])
    np.testing.assert_allclose(dt['location'], gt['location'], atol=1e-3)
    np.testing.assert_allclose(dt['dimensions'], gt['dimensions'],
                               atol=1e-3)
    dyaw = (dt['rotation_y'] - gt['rotation_y'] + np.pi) % (2 * np.pi) \
        - np.pi
    np.testing.assert_allclose(dyaw, 0, atol=1e-3)


def test_ap11_ap40_arithmetic():
    prec = np.zeros((1, 1, 1, 41))
    prec[..., :21] = 1.0      # precision 1 up to recall 0.5
    np.testing.assert_allclose(K.get_mAP11(prec), [[[600 / 11]]])
    np.testing.assert_allclose(K.get_mAP40(prec), [[[50.0]]])
