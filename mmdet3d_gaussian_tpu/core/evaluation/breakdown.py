"""Per-class breakdown masks for the flexible evaluator (reference
``core/evaluation/breakdown.py:5-88``): NoBreakdown (all boxes),
RangeBreakdown (BEV distance bins), VolumeBreakdown (box volume bins).
Ignored GTs are excluded from every breakdown flag."""
from __future__ import annotations

import numpy as np

from ...registry import EVAL_BREAKDOWNS


@EVAL_BREAKDOWNS.register_module()
class NoBreakdown:
    def __init__(self, classes, apply_to=None, **kwargs):
        self.classes = classes
        self.apply_to = apply_to if apply_to is not None else classes
        self.names = ['All']

    def breakdown_flags(self, boxes, attrs=None):
        flags = np.ones((1, len(boxes)), bool)
        if attrs is not None and 'ignore' in attrs:
            flags[:, np.asarray(attrs['ignore'], bool)] = False
        return flags

    def breakdown(self, boxes, label, attrs=None):
        flags = self.breakdown_flags(boxes, attrs)
        if self.classes[label] in self.apply_to:
            return flags
        return flags[:0]

    def breakdown_names(self, label):
        if self.classes[label] in self.apply_to:
            return list(self.names)
        return []


@EVAL_BREAKDOWNS.register_module()
class RangeBreakdown(NoBreakdown):
    def __init__(self, ranges, classes, apply_to=None, **kwargs):
        super().__init__(classes, apply_to)
        self.names = list(ranges.keys())
        self.ranges = list(ranges.values())

    def breakdown_flags(self, boxes, attrs=None):
        if attrs is not None and 'distance' in attrs:
            distance = np.asarray(attrs['distance'])
        else:
            distance = np.linalg.norm(np.asarray(boxes)[:, :3], axis=-1)
        flags = np.stack([(distance >= lo) & (distance < hi)
                          for lo, hi in self.ranges], axis=0)
        if attrs is not None and 'ignore' in attrs:
            flags[:, np.asarray(attrs['ignore'], bool)] = False
        return flags


@EVAL_BREAKDOWNS.register_module()
class VolumeBreakdown(NoBreakdown):
    def __init__(self, ranges, classes, apply_to=None, **kwargs):
        super().__init__(classes, apply_to)
        self.names = list(ranges.keys())
        self.ranges = list(ranges.values())

    def breakdown_flags(self, boxes, attrs=None):
        if attrs is not None and 'volumn' in attrs:
            vol = np.asarray(attrs['volumn'])
        else:
            vol = np.prod(np.asarray(boxes)[:, 3:6], axis=-1)
        flags = np.stack([(vol >= lo) & (vol < hi)
                          for lo, hi in self.ranges], axis=0)
        if attrs is not None and 'ignore' in attrs:
            flags[:, np.asarray(attrs['ignore'], bool)] = False
        return flags
