"""Python-file config system with ``_base_`` inheritance.

Re-provides the subset of mmcv ``Config`` the reference configs depend on
(see reference ``configs/kitti/hv_pointpillars_secfpn_kld5tau1_12x4_160e_kitti-3d-3class.py:1-17``):

* ``Config.fromfile`` executes a python config file and collects its
  module-level names into a nested attribute-accessible dict.
* ``_base_ = ['...']`` pulls in parent configs (paths relative to the child),
  merged depth-first; child keys override parents.
* ``_delete_=True`` inside a dict replaces the inherited dict wholesale
  instead of merging (reference usage:
  ``configs/nuscenes/centerpoint_02pillar_second_secfpn_gwd5_8x4_cyclic_20e_nus.py:6``).
* ``merge_from_dict`` implements the ``--cfg-options`` nested-key CLI override
  (reference ``tools/train.py:60-69``).
"""
from __future__ import annotations

import ast
import copy
import os
import types
from typing import Any, Dict, List, Optional


class ConfigDict(dict):
    """dict with attribute access, recursively applied."""

    def __getattr__(self, name):
        try:
            return self[name]
        except KeyError:
            raise AttributeError(name)

    def __setattr__(self, name, value):
        self[name] = value

    def __deepcopy__(self, memo):
        return ConfigDict({copy.deepcopy(k, memo): copy.deepcopy(v, memo)
                           for k, v in self.items()})


def _to_cfgdict(obj: Any) -> Any:
    if isinstance(obj, dict):
        return ConfigDict({k: _to_cfgdict(v) for k, v in obj.items()})
    if isinstance(obj, (list, tuple)):
        return type(obj)(_to_cfgdict(v) for v in obj)
    return obj


def _merge_dict(base: Dict, child: Dict) -> Dict:
    """Child overrides base; nested dicts merge unless child has _delete_."""
    out = copy.deepcopy(base)
    for k, v in child.items():
        if (isinstance(v, dict) and k in out and isinstance(out[k], dict)
                and not v.pop('_delete_', False)):
            out[k] = _merge_dict(out[k], v)
        else:
            out[k] = copy.deepcopy(v)
    return out


def _exec_pyfile(filename: str) -> Dict[str, Any]:
    with open(filename) as f:
        src = f.read()
    # Validate it parses before exec (clearer errors).
    ast.parse(src, filename=filename)
    mod = types.ModuleType('_cfg')
    mod.__file__ = filename
    exec(compile(src, filename, 'exec'), mod.__dict__)
    return {k: v for k, v in mod.__dict__.items()
            if not k.startswith('__') and not isinstance(v, types.ModuleType)}


def _load_with_bases(filename: str) -> Dict[str, Any]:
    filename = os.path.abspath(filename)
    cfg = _exec_pyfile(filename)
    bases = cfg.pop('_base_', [])
    if isinstance(bases, str):
        bases = [bases]
    merged: Dict[str, Any] = {}
    for b in bases:
        parent = _load_with_bases(os.path.join(os.path.dirname(filename), b))
        merged = _merge_dict(merged, parent)
    return _merge_dict(merged, cfg)


class Config:
    def __init__(self, cfg_dict: Optional[Dict[str, Any]] = None,
                 filename: Optional[str] = None):
        self._cfg = _to_cfgdict(cfg_dict or {})
        self.filename = filename

    @staticmethod
    def fromfile(filename: str) -> 'Config':
        return Config(_load_with_bases(filename), filename=filename)

    def __getattr__(self, name):
        if name.startswith('_') or name == 'filename':
            raise AttributeError(name)
        try:
            return self._cfg[name]
        except KeyError:
            raise AttributeError(name)

    def __setattr__(self, name, value):
        if name in ('_cfg', 'filename'):
            super().__setattr__(name, value)
        else:
            self._cfg[name] = _to_cfgdict(value)

    def __contains__(self, name):
        return name in self._cfg

    def get(self, name, default=None):
        return self._cfg.get(name, default)

    def keys(self):
        return self._cfg.keys()

    def to_dict(self) -> Dict[str, Any]:
        return copy.deepcopy(dict(self._cfg))

    def merge_from_dict(self, options: Dict[str, Any]):
        """Nested-key override: {'model.head.tau': 2.0} etc."""
        for full_key, v in options.items():
            d = self._cfg
            keys = full_key.split('.')
            for k in keys[:-1]:
                d = d.setdefault(k, ConfigDict())
            d[keys[-1]] = _to_cfgdict(v)

    def dump(self) -> str:
        import pprint
        return pprint.pformat(self.to_dict(), width=100)
