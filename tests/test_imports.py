"""Import sweep: every package module and every tools script must import.

Catches syntax/import rot in rarely-exercised files (the class of bug the
converter round-trip test caught at runtime).
"""
import importlib
import importlib.util
import os
import pkgutil
import sys

import pytest

import mmdet3d_gaussian_tpu as pkg

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _package_modules():
    names = []
    for m in pkgutil.walk_packages(pkg.__path__, prefix='mmdet3d_gaussian_tpu.'):
        names.append(m.name)
    return names


@pytest.mark.parametrize('name', _package_modules())
def test_package_module_imports(name):
    importlib.import_module(name)


def _tool_scripts():
    out = []
    for dirpath, _, files in os.walk(os.path.join(REPO, 'tools')):
        for f in files:
            if f.endswith('.py'):
                out.append(os.path.join(dirpath, f))
    return sorted(out)


@pytest.mark.parametrize('path', _tool_scripts(),
                         ids=lambda p: os.path.relpath(p, REPO))
def test_tool_script_imports(path):
    # import (not run): __main__ guards keep CLIs inert
    name = 'toolmod_' + os.path.basename(path)[:-3]
    spec = importlib.util.spec_from_file_location(name, path)
    mod = importlib.util.module_from_spec(spec)
    sys.modules[name] = mod
    try:
        spec.loader.exec_module(mod)
    finally:
        sys.modules.pop(name, None)
