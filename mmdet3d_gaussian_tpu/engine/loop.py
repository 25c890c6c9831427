"""Training loop: data iterator, jitted step, checkpointing, logging.

The TPU analogue of the mmcv ``EpochBasedRunner`` + hooks stack the reference
delegates to (SURVEY.md §3.1): a python loop around one jitted SPMD step,
orbax checkpoints (reference mmcv ``CheckpointHook``, interval=1 epoch),
JSON-lines logging every ``log_interval`` steps (reference TextLoggerHook),
and `jax.profiler` trace capture on demand.
"""
from __future__ import annotations

import json
import os
import time
from typing import Any, Dict, Iterator, Optional

import numpy as np


def build_dataloader(cfg, split: str = 'train'):
    """Build dataset + iterator of collated numpy batches.

    ``data.workers_per_gpu`` (reference DataLoader worker analogue) maps
    ``dataset[idx]`` over a thread pool; see ``engine/prefetch.py``.
    """
    from ..registry import DATASETS
    from ..datasets.pipelines import collate_batch
    from .prefetch import pooled_sample_iterator

    data_cfg = dict(cfg.get('data', {}).get(split, {}))
    if not data_cfg:
        raise KeyError(
            f"config has no data.{split} section (data keys: "
            f"{sorted(cfg.get('data', {}).keys())})")
    ds = DATASETS.build(data_cfg)
    batch_size = int(cfg.get('data', {}).get('samples_per_gpu', 4))
    workers = int(cfg.get('data', {}).get('workers_per_gpu', 2))
    shuffle = split == 'train'

    def iterator(seed: int = 0) -> Iterator[Dict]:
        # eval splits iterate IN ORDER and pad the final partial batch by
        # repeating the last sample (results[:len(ds)] stays index-aligned
        # with dataset.get_ann_info); train shuffles and drops the remainder
        rng = np.random.RandomState(seed)
        order = rng.permutation(len(ds)) if shuffle else range(len(ds))
        bsz = batch_size
        if shuffle:
            import jax
            nproc = jax.process_count()
            if nproc > 1:
                # per-host data plane: every host draws the SAME global
                # shuffle (seeded), then loads only its slice of each
                # global batch — batch m, host h gets rows
                # order[m*B + h*B/k : m*B + (h+1)*B/k].  The device arrays
                # are assembled from the local rows in run_training via
                # jax.make_array_from_process_local_data.
                assert batch_size % nproc == 0, (
                    f'samples_per_gpu {batch_size} must divide by the '
                    f'process count {nproc} for multi-host training')
                bsz = batch_size // nproc
                h = jax.process_index()
                nb = len(ds) // batch_size
                order = np.asarray(order)[:nb * batch_size]
                order = order.reshape(nb, batch_size)[
                    :, h * bsz:(h + 1) * bsz].reshape(-1)
        return pooled_sample_iterator(ds, order, bsz, collate_batch,
                                      workers=workers,
                                      pad_partial=not shuffle)

    return ds, iterator


def save_checkpoint(work_dir: str, state, step: int,
                    meta: Optional[Dict[str, Any]] = None):
    """Orbax save + a ``meta.json`` sidecar (the reference embeds config
    text / CLASSES / versions into its checkpoints, tools/train.py:200-210)."""
    import orbax.checkpoint as ocp
    path = os.path.abspath(os.path.join(work_dir, f'ckpt_{step}'))
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(path, state)
    ckptr.wait_until_finished()
    if meta:
        # sidecar next to the orbax dir (not inside: orbax validates its
        # own directory structure on restore; not 'ckpt_*': tools glob that
        # prefix for restorable checkpoints)
        with open(os.path.join(work_dir, f'meta_{step}.json'), 'w') as f:
            json.dump(meta, f, indent=1, default=str)
    return path


def restore_checkpoint(path: str, target):
    import orbax.checkpoint as ocp
    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.abspath(path), target)


def run_training(det, cfg, work_dir: str, seed: int = 0,
                 max_steps: Optional[int] = None,
                 resume_from: Optional[str] = None,
                 load_from: Optional[str] = None,
                 eval_interval: Optional[int] = None,
                 log_interval: Optional[int] = None,
                 profile_steps: Optional[tuple] = None):
    """Runtime knobs resolve CLI-arg -> config key -> default, mirroring the
    reference's ``configs/_base_/default_runtime.py:1-18`` keys
    (``checkpoint_config.interval``, ``log_config.interval``,
    ``evaluation.interval``, ``load_from``, ``resume_from``)."""
    import jax
    from ..parallel import train_state as ts
    from ..parallel.mesh import make_mesh, shard_batch, use_mesh

    resume_from = resume_from or cfg.get('resume_from')
    load_from = load_from or cfg.get('load_from')
    if log_interval is None:
        log_interval = int((cfg.get('log_config') or {}).get('interval', 50))
    if eval_interval is None:
        eval_interval = int((cfg.get('evaluation') or {}).get('interval', 0))
    ckpt_interval = int((cfg.get('checkpoint_config') or {})
                        .get('interval', 1))

    ds, make_iter = build_dataloader(cfg, 'train')
    epochs = int(cfg.get('max_epochs', 40))
    batch_size = int(cfg.get('data', {}).get('samples_per_gpu', 4))
    steps_per_epoch = max(1, len(ds) // batch_size)
    total_steps = max_steps or epochs * steps_per_epoch

    optimizer = ts.make_optimizer_from_cfg(cfg, total_steps,
                                           steps_per_epoch=steps_per_epoch)

    # init from one real batch (close the iterator so its prefetch pool
    # doesn't linger loading samples nobody will consume)
    init_iter = make_iter(seed)
    first = next(init_iter)
    init_iter.close()
    first.pop('metas', None)   # non-array; jitted init takes arrays only
    variables = jax.jit(det.init)(jax.random.PRNGKey(seed), first)
    state = ts.init_state(variables['params'], variables['batch_stats'],
                          optimizer)
    if resume_from:
        state = restore_checkpoint(resume_from, state)
    elif load_from:
        # reference `load_from` semantics: warm-start WEIGHTS only — step
        # and optimizer state restart fresh (mmcv runner.load_checkpoint)
        loaded = restore_checkpoint(load_from, state)
        state = state._replace(params=loaded.params,
                               batch_stats=loaded.batch_stats)

    def apply_fn(vs, b, train):
        return det.apply_train(vs, b)

    step_fn = jax.jit(ts.make_train_step(apply_fn, det.loss, optimizer),
                      donate_argnums=(0,))
    # data axis must divide the batch; use the largest divisor <= n_devices
    n_dev = max(d for d in range(1, jax.device_count() + 1)
                if batch_size % d == 0)
    mesh = make_mesh(n_dev, axis_names=('data',))

    log_path = os.path.join(work_dir, 'train_log.jsonl')
    step = int(state.step)
    t0 = time.time()
    from .prefetch import prefetch

    nproc = jax.process_count()
    if nproc > 1:
        # per-host batches: this process loaded B/nproc rows; assemble the
        # global (B, ...) arrays from each host's local contribution
        from jax.sharding import NamedSharding, PartitionSpec as P

        def place(b):
            b.pop('metas', None)
            sh = NamedSharding(mesh, P('data'))

            def g(x):
                x = np.asarray(x)
                return jax.make_array_from_process_local_data(
                    sh, x, (x.shape[0] * nproc,) + x.shape[1:])

            return jax.tree_util.tree_map(g, b)
    else:
        def place(b):
            # runs in the producer thread: collate output -> sharded device
            # arrays, so H2D transfer overlaps the device step (shard_batch
            # builds explicit NamedShardings — no thread-local ambient mesh)
            b.pop('metas', None)
            return shard_batch(mesh, b)

    is_main = jax.process_index() == 0   # rank-0 logging across hosts
    with use_mesh(mesh), open(log_path, 'a') as logf:
        for epoch in range(epochs):
            pf = prefetch(make_iter(seed + epoch), depth=2, place_fn=place)
            for sb in pf:
                if profile_steps and step == profile_steps[0]:
                    jax.profiler.start_trace(
                        os.path.join(work_dir, 'profile'))
                state, metrics = step_fn(state, sb)
                step += 1
                if profile_steps and step == profile_steps[1]:
                    jax.block_until_ready(metrics)
                    jax.profiler.stop_trace()
                    print('profiler trace written to',
                          os.path.join(work_dir, 'profile'))
                if step % log_interval == 0:
                    jax.block_until_ready(metrics)
                    rec = {k: float(v) for k, v in metrics.items()}
                    rec.update(step=step, epoch=epoch,
                               time=round(time.time() - t0, 1))
                    if is_main:
                        logf.write(json.dumps(rec) + '\n')
                        logf.flush()
                        print(f'step {step}: loss={rec["loss"]:.4f}')
                if step >= total_steps:
                    break
            pf.close()   # unblock the producer on early exit
            import jax as _jax
            last_epoch = (epoch + 1 == epochs) or step >= total_steps
            if (epoch + 1) % ckpt_interval == 0 or last_epoch:
                meta = dict(step=step, epoch=epoch,
                            classes=list(getattr(ds, 'CLASSES', []) or []),
                            jax_version=_jax.__version__,
                            config=cfg.to_dict() if hasattr(cfg, 'to_dict')
                            else None)
                save_checkpoint(work_dir, state, step, meta=meta)
            # training-time evaluation (the reference's evaluation hook,
            # `evaluation = dict(interval=...)` in every config)
            if (eval_interval and (epoch + 1) % eval_interval == 0
                    and cfg.get('data', {}).get('val')):
                report = run_evaluation(det, cfg, state)
                rec = {f'val/{k}': float(v) for k, v in report.items()}
                rec.update(step=step, epoch=epoch)
                if is_main:
                    logf.write(json.dumps(rec) + '\n')
                    logf.flush()
                    print(f'eval @ epoch {epoch}: {rec}')
            if step >= total_steps:
                break
    return state


def detector_num_classes(det) -> int:
    """Total class count across detector families (anchor heads expose
    num_classes; CenterHead exposes per-task splits; PV-RCNN via its RPN)."""
    head = getattr(det, 'head', None) or getattr(det, 'rpn_head', None)
    if hasattr(head, 'num_classes'):
        return int(head.num_classes)
    if hasattr(head, 'tasks'):
        return int(sum(t['num_classes'] for t in head.tasks))
    raise AttributeError(f'cannot infer num_classes from {det!r}')


def run_evaluation(det, cfg, state):
    """Predict over the val split and run ``dataset.evaluate``."""
    import jax
    import numpy as np

    ds, make_iter = build_dataloader(cfg, 'val')
    variables = {'params': state.params, 'batch_stats': state.batch_stats}
    # cache the jitted predict on the detector: re-wrapping in a fresh
    # jax.jit per eval epoch forces a full recompile (minutes on TPU)
    predict = getattr(det, '_jit_predict', None)
    if predict is None:
        predict = jax.jit(det.predict)
        det._jit_predict = predict
    num_classes = detector_num_classes(det)
    results = []
    for batch in make_iter(0):
        batch.pop('metas', None)
        boxes, scores, labels, valid = predict(variables, batch)
        boxes, scores = np.asarray(boxes), np.asarray(scores)
        labels, valid = np.asarray(labels), np.asarray(valid)
        for i in range(boxes.shape[0]):
            per_cls = []
            for c in range(num_classes):
                sel = valid[i] & (labels[i] == c)
                per_cls.append(np.concatenate(
                    [boxes[i][sel][:, :7], scores[i][sel][:, None]],
                    -1).astype(np.float32))
            results.append(per_cls)
    return ds.evaluate(results[:len(ds)])
