"""Build hook: compile the native eval kernels into the package.

The reference builds three torch CUDAExtensions (``/root/reference/setup.py``);
here the only native code outside XLA's reach is the CPU eval fast path
(exact rotated-polygon IoU + COCO/KITTI matchers, ``csrc/eval_ops.cpp``).
It is a plain C-ABI shared object loaded with ctypes (no pybind11 in the
target images), so the Extension below is just a convenient way to have
pip place a compiled ``.so`` inside the installed package — it is never
imported as a Python module.  From a source checkout the library instead
auto-builds via ``make -C csrc`` on first use.
"""
from setuptools import setup
from setuptools.extension import Extension

setup(
    ext_modules=[
        Extension(
            'mmdet3d_gaussian_tpu._libeval_ops',
            sources=['csrc/eval_ops.cpp'],
            extra_compile_args=['-O3', '-std=c++17', '-fvisibility=default'],
        ),
    ],
)
