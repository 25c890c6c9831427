"""XLA compiler tuning for the detection workload.

``space-to-batch-converter`` rewrites convolutions whose batch is small by
slicing a spatial dim into the batch dim (e.g. NHWC ``[4, 248, 216, C]`` →
``[248, 32, 27, C]``).  For this workload the rewrite is a large net LOSS:
every conv gains pad/copy/slice halo handling, and the per-op trace of the
KITTI b4 train step shows ~26 ms/step (43%) of pure data movement —
``copy`` ops alone 12 ms/step — almost all of it space-to-batch relayouts.
Disabling the pass (measured on v5e, honest chained-readback clock,
``tools/misc/profile_train_step.py``):

    KITTI  b4 x 16384, f32 dynamic:  60.5 -> 40.7 ms/step  (+49% throughput)

The flag must reach XLA before the backend parses ``XLA_FLAGS`` (first
device/compile use), so call :func:`enable` before touching jax — bench.py,
``tools/train.py``/``test.py`` and ``__graft_entry__.py`` all do.  Safe to
call multiple times; appends to, never overwrites, an existing
``XLA_FLAGS``; set ``MMDET3D_TPU_NO_XLA_TUNING=1`` to opt out.
"""
from __future__ import annotations

import os
import re
import sys

__all__ = ['enable', 'DISABLED_PASSES']

DISABLED_PASSES = ('space-to-batch-converter',)

_PASS_FLAG_RE = re.compile(r'(--xla_disable_hlo_passes=)([^\s]*)')


def _backend_initialized() -> bool:
    """True if a jax backend already parsed XLA_FLAGS (flag would no-op)."""
    xb = sys.modules.get('jax._src.xla_bridge')
    return bool(xb is not None and getattr(xb, '_backends', None))


def enable() -> None:
    """Append the workload's XLA flag overrides to ``XLA_FLAGS``.

    If the user already passes ``--xla_disable_hlo_passes``, our passes are
    MERGED into their list (dedup'd) rather than dropped, so the ~20 ms/step
    space-to-batch win survives user debugging sessions.
    """
    if os.environ.get('MMDET3D_TPU_NO_XLA_TUNING') == '1':
        return
    if _backend_initialized():
        print('mmdet3d_gaussian_tpu.utils.xla_tuning: WARNING — jax backend '
              'already initialized; XLA_FLAGS changes will not take effect '
              'this process. Call enable() before first jax use.',
              file=sys.stderr)
    flags = os.environ.get('XLA_FLAGS', '')
    m = _PASS_FLAG_RE.search(flags)
    if m:
        have = [p for p in m.group(2).split(',') if p]
        merged = have + [p for p in DISABLED_PASSES if p not in have]
        if merged != have:
            print('mmdet3d_gaussian_tpu.utils.xla_tuning: merging '
                  f'{DISABLED_PASSES} into existing --xla_disable_hlo_passes',
                  file=sys.stderr)
        os.environ['XLA_FLAGS'] = (
            flags[:m.start()] + m.group(1) + ','.join(merged)
            + flags[m.end():])
        return
    opt = '--xla_disable_hlo_passes=' + ','.join(DISABLED_PASSES)
    os.environ['XLA_FLAGS'] = (flags + ' ' + opt).strip()
