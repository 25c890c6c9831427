#!/usr/bin/env python
"""Import a reference (torch / mmdet3d) checkpoint into this framework.

The reference evaluates trained checkpoints through ``tools/test.py``
(``/root/reference/tools/test.py:102`` checkpoint-load flow).  This tool is
the bridge for its artifacts: it maps a torch ``state_dict`` from a
reference-trained PointPillars-family run onto this framework's variable
tree and writes an orbax checkpoint that ``tools/test.py CONFIG CKPT``
evaluates directly — so AP parity against the reference's published
numbers (``/root/reference/README.md:7-28``) is checkable the day real
data + a reference checkpoint are attached.

Usage:
    python tools/import_torch_ckpt.py ref.pth --config configs/kitti/....py \
        --out work_dir/imported
    python tools/test.py configs/kitti/....py work_dir/imported/ckpt_0

Key/value transforms (validated by the transplanted-weight parity suite —
``tests/test_reference_parity_model.py`` pins the same conventions):
  * ``voxel_encoder.pfn_layers.{i}.linear.weight`` (out, in) ->
    ``voxel_encoder/pfn_{i}/linear/kernel`` = W^T;
  * Conv2d ``weight`` (cout, cin, kh, kw) -> HWIO ``kernel`` via
    transpose(2, 3, 1, 0) (backbone blocks, stride-1 deblocks, head 1x1s);
  * ConvTranspose2d ``weight`` (cin, cout, kh, kw) -> flax ConvTranspose
    ``kernel`` (kh, kw, cin, cout) via transpose(2, 3, 0, 1)
    (stride>1 deblocks; the d2s lowering consumes the same parameter);
  * BN ``weight/bias/running_mean/running_var`` ->
    params ``scale/bias`` + batch_stats ``mean/var``.

Backbone Sequential indices are DISCOVERED from the state_dict (4-D
weights in order = [down, block0, block1, ...] per stage; the following
1-D weight with a running_mean sibling is its BN), so both upstream
layouts (with and without the leading ZeroPad2d) import correctly.
"""
from __future__ import annotations

import argparse
import os
import re
import sys
from typing import Dict, Tuple

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))


def _conv_from_torch(w):
    return np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0)))


def _convt_from_torch(w):
    return np.ascontiguousarray(np.transpose(w, (2, 3, 0, 1)))


def _bn_from_torch(sd, prefix):
    return ({'scale': np.asarray(sd[prefix + '.weight']),
             'bias': np.asarray(sd[prefix + '.bias'])},
            {'mean': np.asarray(sd[prefix + '.running_mean']),
             'var': np.asarray(sd[prefix + '.running_var'])})


def _block_layout(sd: Dict, stage: int) -> Tuple[list, list]:
    """Discover (conv_idx, bn_idx) lists of ``backbone.blocks.{stage}``."""
    convs, bns = [], []
    idxs = sorted({int(m.group(1)) for k in sd
                   for m in [re.match(
                       rf'backbone\.blocks\.{stage}\.(\d+)\.weight$', k)]
                   if m})
    for j in idxs:
        w = np.asarray(sd[f'backbone.blocks.{stage}.{j}.weight'])
        if w.ndim == 4:
            convs.append(j)
        elif f'backbone.blocks.{stage}.{j}.running_mean' in sd:
            bns.append(j)
    return convs, bns


def torch_to_variables(sd: Dict, variables: Dict,
                       upsample_strides=None) -> Tuple[Dict, Dict]:
    """Map a reference PointPillars state_dict onto ``variables``.

    Returns (new_variables, report) where report lists matched / missing
    tree paths and unused state_dict keys."""
    import jax

    params = jax.tree_util.tree_map(np.asarray, variables['params'])
    stats = jax.tree_util.tree_map(np.asarray, variables['batch_stats'])
    used = set()
    matched, missing = [], []

    def take(key, transform=None):
        if key in sd:
            used.add(key)
            v = np.asarray(sd[key])
            return transform(v) if transform else v
        missing.append(key)
        return None

    def put(tree, path, value):
        if value is None:
            return
        node = tree
        for p in path[:-1]:
            node = node[p]
        tmpl = node[path[-1]]
        if tuple(tmpl.shape) != tuple(value.shape):
            raise ValueError(f'{"/".join(path)}: checkpoint shape '
                             f'{value.shape} != model {tmpl.shape}')
        node[path[-1]] = value.astype(tmpl.dtype)
        matched.append('/'.join(path))

    def put_bn(ptree, stree, path, prefix):
        if prefix + '.weight' not in sd:
            missing.append(prefix + '.*')
            return
        p_bn, s_bn = _bn_from_torch(sd, prefix)
        for k in ('weight', 'bias', 'running_mean', 'running_var',
                  'num_batches_tracked'):
            used.discard(prefix + '.' + k)
            if prefix + '.' + k in sd:
                used.add(prefix + '.' + k)
        put(ptree, path + ['scale'], p_bn['scale'])
        put(ptree, path + ['bias'], p_bn['bias'])
        put(stree, path + ['mean'], s_bn['mean'])
        put(stree, path + ['var'], s_bn['var'])

    # ---- voxel encoder -------------------------------------------------
    enc_p = params.get('voxel_encoder', {})
    for name in sorted(enc_p):
        m = re.match(r'pfn_(\d+)$', name)
        if not m:
            continue
        i = int(m.group(1))
        put(params, ['voxel_encoder', name, 'linear', 'kernel'],
            take(f'voxel_encoder.pfn_layers.{i}.linear.weight',
                 lambda w: np.ascontiguousarray(w.T)))
        put_bn(params, stats, ['voxel_encoder', name, 'norm'],
               f'voxel_encoder.pfn_layers.{i}.norm')

    # ---- backbone ------------------------------------------------------
    stages = sorted({int(m.group(1)) for k in params.get('backbone', {})
                     for m in [re.match(r'stage(\d+)_', k)] if m})
    for s in stages:
        convs, bns = _block_layout(sd, s)
        names = [f'stage{s}_down'] + [
            f'stage{s}_block{j}' for j in range(len(convs) - 1)]
        for name, cj, bj in zip(names, convs, bns):
            if name not in params['backbone']:
                missing.append(f'backbone/{name}')
                continue
            put(params, ['backbone', name, 'conv', 'kernel'],
                take(f'backbone.blocks.{s}.{cj}.weight', _conv_from_torch))
            put_bn(params, stats, ['backbone', name, 'bn'],
                   f'backbone.blocks.{s}.{bj}')

    # ---- neck ----------------------------------------------------------
    for name in sorted(params.get('neck', {})):
        m = re.match(r'deblock(\d+)_conv$', name)
        if not m:
            continue
        i = int(m.group(1))
        tmpl = params['neck'][name]['kernel']
        key = f'neck.deblocks.{i}.0.weight'
        if key in sd:
            w = np.asarray(sd[key])
            # ConvTranspose2d stores (cin, cout, k, k); Conv2d (cout,
            # cin, k, k).  A shape test alone is ambiguous when cin ==
            # cout, so decide structurally: k == 1 deblocks are plain
            # 1x1 convs (upsample stride 1); k > 1 with upsample stride
            # > 1 is ConvTranspose; k > 1 with stride < 1 (downsampling
            # deblock, e.g. nus centerpoint 0.5) is Conv2d.
            k = int(tmpl.shape[0])
            s_i = (upsample_strides[i]
                   if upsample_strides is not None
                   and i < len(upsample_strides) else (2 if k > 1 else 1))
            if k > 1 and s_i > 1:
                cand = _convt_from_torch(w)
            else:
                cand = _conv_from_torch(w)
            used.add(key)
            put(params, ['neck', name, 'kernel'], cand)
        else:
            missing.append(key)
        put_bn(params, stats, ['neck', f'deblock{i}_bn'],
               f'neck.deblocks.{i}.1')

    # ---- head ----------------------------------------------------------
    for conv in ('conv_cls', 'conv_reg', 'conv_dir_cls'):
        if conv not in params.get('bbox_head', {}):
            continue
        put(params, ['bbox_head', conv, 'kernel'],
            take(f'bbox_head.{conv}.weight', _conv_from_torch))
        put(params, ['bbox_head', conv, 'bias'],
            take(f'bbox_head.{conv}.bias'))

    report = dict(matched=matched, missing=missing,
                  unused=sorted(k for k in sd if k not in used
                                and not k.endswith('num_batches_tracked')))
    return {'params': params, 'batch_stats': stats}, report


def variables_to_torch(variables: Dict) -> Dict:
    """Inverse mapping (round-trip validation + exporting to reference
    tooling).  Emits the no-ZeroPad Sequential layout (conv 0, bn 1, ...)."""
    sd = {}
    params, stats = variables['params'], variables['batch_stats']

    def bn_out(prefix, p, s):
        sd[prefix + '.weight'] = np.asarray(p['scale'])
        sd[prefix + '.bias'] = np.asarray(p['bias'])
        sd[prefix + '.running_mean'] = np.asarray(s['mean'])
        sd[prefix + '.running_var'] = np.asarray(s['var'])

    for name, sub in params.get('voxel_encoder', {}).items():
        m = re.match(r'pfn_(\d+)$', name)
        if not m:
            continue
        i = int(m.group(1))
        sd[f'voxel_encoder.pfn_layers.{i}.linear.weight'] = \
            np.ascontiguousarray(np.asarray(sub['linear']['kernel']).T)
        bn_out(f'voxel_encoder.pfn_layers.{i}.norm', sub['norm'],
               stats['voxel_encoder'][name]['norm'])

    for name, sub in params.get('backbone', {}).items():
        m = re.match(r'stage(\d+)_(down|block(\d+))$', name)
        if not m:
            continue
        s = int(m.group(1))
        j = 0 if m.group(2) == 'down' else 3 * (int(m.group(3)) + 1)
        w = np.asarray(sub['conv']['kernel'])
        sd[f'backbone.blocks.{s}.{j}.weight'] = \
            np.ascontiguousarray(np.transpose(w, (3, 2, 0, 1)))
        bn_out(f'backbone.blocks.{s}.{j + 1}', sub['bn'],
               stats['backbone'][name]['bn'])

    for name, sub in params.get('neck', {}).items():
        m = re.match(r'deblock(\d+)_conv$', name)
        if not m:
            continue
        i = int(m.group(1))
        w = np.asarray(sub['kernel'])
        if w.shape[0] > 1:   # (k, k, cin, cout) ConvTranspose layout
            out = np.transpose(w, (2, 3, 0, 1))
        else:                # 1x1 conv
            out = np.transpose(w, (3, 2, 0, 1))
        sd[f'neck.deblocks.{i}.0.weight'] = np.ascontiguousarray(out)
        bn_out(f'neck.deblocks.{i}.1', params['neck'][f'deblock{i}_bn'],
               stats['neck'][f'deblock{i}_bn'])

    for conv in ('conv_cls', 'conv_reg', 'conv_dir_cls'):
        if conv not in params.get('bbox_head', {}):
            continue
        w = np.asarray(params['bbox_head'][conv]['kernel'])
        sd[f'bbox_head.{conv}.weight'] = \
            np.ascontiguousarray(np.transpose(w, (3, 2, 0, 1)))
        sd[f'bbox_head.{conv}.bias'] = \
            np.asarray(params['bbox_head'][conv]['bias'])
    return sd


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument('checkpoint', help='torch .pth (state_dict or '
                   '{"state_dict": ...})')
    p.add_argument('--config', required=True)
    p.add_argument('--out', required=True, help='work dir for the orbax '
                   'checkpoint (ckpt_0)')
    args = p.parse_args()

    from mmdet3d_gaussian_tpu.utils import xla_tuning
    xla_tuning.enable()
    import jax
    import torch

    from mmdet3d_gaussian_tpu.engine.detector import (PointPillarsDetector,
                                                      synthetic_batch)
    from mmdet3d_gaussian_tpu.engine.loop import save_checkpoint
    from mmdet3d_gaussian_tpu.parallel import train_state as ts
    from mmdet3d_gaussian_tpu.utils.config import Config

    cfg = Config.fromfile(args.config)
    model_cfg = dict(cfg.get('model') or {})
    model_cfg.pop('type', None)
    det = PointPillarsDetector(model_cfg=model_cfg,
                               head_cfg=cfg.get('head'))
    batch = synthetic_batch(
        batch_size=1, num_points=2048, num_gt=4,
        pc_range=det.model_cfg['point_cloud_range'],
        num_feats=det.model_cfg.get('encoder_cfg', {}).get('in_channels', 4))
    variables = jax.jit(det.init)(jax.random.PRNGKey(0), batch)

    raw = torch.load(args.checkpoint, map_location='cpu',
                     weights_only=False)
    sd = raw.get('state_dict', raw) if isinstance(raw, dict) else raw
    sd = {k: (v.numpy() if hasattr(v, 'numpy') else np.asarray(v))
          for k, v in sd.items()}

    strides = (cfg.get('model') or {}).get(
        'neck_cfg', {}).get('upsample_strides')
    new_vars, report = torch_to_variables(
        sd, variables, upsample_strides=strides)
    print(f'matched {len(report["matched"])} tree paths; '
          f'{len(report["missing"])} missing; '
          f'{len(report["unused"])} unused checkpoint keys')
    for k in report['missing'][:20]:
        print('  missing:', k)
    for k in report['unused'][:20]:
        print('  unused :', k)

    optimizer = ts.make_optimizer_from_cfg(cfg, total_steps=1)
    state = ts.init_state(new_vars['params'], new_vars['batch_stats'],
                          optimizer)
    save_checkpoint(args.out, state, 0,
                    meta=dict(source=os.path.abspath(args.checkpoint),
                              imported='torch_state_dict'))
    print(f'wrote orbax checkpoint: {args.out}/ckpt_0')


if __name__ == '__main__':
    main()
