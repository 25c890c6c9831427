"""Serving export: serialize the jitted predict function to StableHLO.

The reference has no deployment story beyond torch checkpoints; for a
TPU-serving framework the natural artifact is a ``jax.export`` bundle —
the traced + lowered predict program (StableHLO, versioned calling
convention) with the trained variables baked in as constants.  A server
deserializes and calls it with NO framework, config, or model code — only
jax — and the program can be lowered for CPU or TPU at export time.

Bundle layout (a directory):
    predict.stablehlo   serialized jax.export.Exported
    meta.json           classes, batch shape contract, export platform
"""
from __future__ import annotations

import json
import os
from typing import Any, Dict, Optional

import numpy as np

__all__ = ['export_predict', 'load_exported']


def export_predict(det, variables, example_batch,
                   out_dir: str,
                   classes=(),
                   platforms=None) -> str:
    """Export ``det.predict`` with ``variables`` closed over.

    Args:
        det: a detector engine (``predict(variables, batch)``).
        variables: trained variables pytree.
        example_batch: array pytree fixing the input shape contract
            (entries with non-array leaves must be removed by the caller).
        out_dir: bundle directory (created).
        platforms: optional lowering platform list, e.g. ``('tpu',)`` or
            ``('cpu', 'tpu')``; defaults to the current backend.
    Returns the bundle path.
    """
    import jax
    from jax import export as jexport

    def predict_fn(batch):
        return det.predict(variables, batch)

    specs = jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(np.shape(x), np.asarray(x).dtype),
        example_batch)
    kwargs = {}
    if platforms is not None:
        kwargs['platforms'] = tuple(platforms)
    exp = jexport.export(jax.jit(predict_fn), **kwargs)(specs)

    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, 'predict.stablehlo'), 'wb') as f:
        f.write(exp.serialize())
    meta: Dict[str, Any] = dict(
        classes=list(classes),
        platforms=list(exp.platforms),
        batch_spec={k: [list(np.shape(v)), str(np.asarray(v).dtype)]
                    for k, v in example_batch.items()},
        outputs='boxes (B,K,7+), scores (B,K), labels (B,K), valid (B,K)',
        jax_version=jax.__version__,
    )
    with open(os.path.join(out_dir, 'meta.json'), 'w') as f:
        json.dump(meta, f, indent=1)
    return out_dir


class _Loaded:
    """Callable wrapper over a deserialized bundle."""

    def __init__(self, exported, meta):
        self.exported = exported
        self.meta = meta

    def __call__(self, batch):
        return self.exported.call(batch)


def load_exported(bundle_dir: str) -> _Loaded:
    from jax import export as jexport
    with open(os.path.join(bundle_dir, 'predict.stablehlo'), 'rb') as f:
        exp = jexport.deserialize(f.read())
    meta = {}
    mpath = os.path.join(bundle_dir, 'meta.json')
    if os.path.exists(mpath):
        with open(mpath) as f:
            meta = json.load(f)
    return _Loaded(exp, meta)
