"""utils/xla_tuning: env handling (pure env logic — no backend touched)."""
import os

from mmdet3d_gaussian_tpu.utils import xla_tuning


def _with_env(monkeypatch, **env):
    for k in ('XLA_FLAGS', 'MMDET3D_TPU_NO_XLA_TUNING'):
        monkeypatch.delenv(k, raising=False)
    for k, v in env.items():
        monkeypatch.setenv(k, v)


def test_enable_sets_disable_passes(monkeypatch):
    _with_env(monkeypatch)
    xla_tuning.enable()
    assert ('--xla_disable_hlo_passes=space-to-batch-converter'
            in os.environ['XLA_FLAGS'])


def test_enable_appends_to_existing_flags(monkeypatch):
    _with_env(monkeypatch, XLA_FLAGS='--xla_dump_to=/tmp/d')
    xla_tuning.enable()
    flags = os.environ['XLA_FLAGS']
    assert flags.startswith('--xla_dump_to=/tmp/d ')
    assert '--xla_disable_hlo_passes=' in flags


def test_enable_idempotent(monkeypatch):
    _with_env(monkeypatch)
    xla_tuning.enable()
    once = os.environ['XLA_FLAGS']
    xla_tuning.enable()
    assert os.environ['XLA_FLAGS'] == once


def test_enable_merges_into_user_pass_list(monkeypatch):
    user = '--xla_disable_hlo_passes=foo'
    _with_env(monkeypatch, XLA_FLAGS=user)
    xla_tuning.enable()
    # User passes preserved, ours appended (dedup'd), nothing dropped.
    assert (os.environ['XLA_FLAGS']
            == '--xla_disable_hlo_passes=foo,space-to-batch-converter')
    once = os.environ['XLA_FLAGS']
    xla_tuning.enable()
    assert os.environ['XLA_FLAGS'] == once


def test_opt_out(monkeypatch):
    _with_env(monkeypatch, MMDET3D_TPU_NO_XLA_TUNING='1')
    xla_tuning.enable()
    assert 'XLA_FLAGS' not in os.environ
