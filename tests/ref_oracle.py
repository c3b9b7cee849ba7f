"""Import the PyTorch/CUDA reference (`/root/reference/pcdet`) on CPU as a
golden-stage parity oracle.

The reference's CUDA extensions, spconv, numba and SharedArray are not built
in this environment; we stub exactly enough for the pure-Python/pure-torch
modules (box coders, target assigners, centernet utils, the KITTI AP driver)
to import. numba.jit is replaced by a passthrough decorator so the numba
functions run as plain Python — slow, fine for small test cases. Functions
that actually invoke a CUDA kernel raise at call time, which is the correct
failure mode for an oracle.
"""
from __future__ import annotations

import sys
import types

_REF = '/root/reference'


def _passthrough_jit(*args, **kwargs):
    if len(args) == 1 and callable(args[0]) and not kwargs:
        return args[0]

    def deco(fn):
        return fn
    return deco


class _EasyDict(dict):
    """Functional stand-in for the easydict package (attribute-style access
    with recursive conversion), enough for pcdet's config consumers."""

    def __init__(self, d=None, **kwargs):
        super().__init__()
        for k, v in {**(d or {}), **kwargs}.items():
            self[k] = self._wrap(v)

    @classmethod
    def _wrap(cls, v):
        if isinstance(v, dict) and not isinstance(v, cls):
            return cls(v)
        if isinstance(v, (list, tuple)):
            return type(v)(cls._wrap(x) for x in v)
        return v

    def __getattr__(self, k):
        try:
            return self[k]
        except KeyError as e:
            raise AttributeError(k) from e

    def __setattr__(self, k, v):
        self[k] = self._wrap(v)


class _CudaKernelStub:
    """Stands in for @numba.cuda.jit kernels: raises only if launched."""

    def __init__(self, fn):
        self.fn = fn

    def __getitem__(self, launch_cfg):
        raise RuntimeError('numba.cuda kernel launch attempted in CPU oracle')


def install():
    """Idempotent: installs stub modules + puts /root/reference on sys.path."""
    if _REF not in sys.path:
        sys.path.insert(0, _REF)

    # the reference hard-codes .cuda() in a few constructors
    # (e.g. PointResidualCoder) — make it a no-op on this CPU-only torch
    import torch
    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.nn.Module.cuda = lambda self, *a, **k: self

    def stub(name):
        if name in sys.modules:
            return sys.modules[name]
        mod = types.ModuleType(name)
        sys.modules[name] = mod
        return mod

    stub('pcdet.version').__version__ = '0.6.0+oracle'
    stub('SharedArray')
    if 'easydict' not in sys.modules:
        ed = types.ModuleType('easydict')
        ed.EasyDict = _EasyDict
        sys.modules['easydict'] = ed
    spconv = stub('spconv')
    spconv.__version__ = '2.3.6'
    spconv.constants = types.SimpleNamespace(SPCONV_USE_DIRECT_TABLE=False)
    spconv_pytorch = stub('spconv.pytorch')
    spconv.pytorch = spconv_pytorch
    # don't clobber the functional dense-emulation shim (ref_spconv_shim)
    if not getattr(spconv_pytorch, '_functional_shim', False):
        for cls in ['SparseModule', 'SparseConv3d', 'SubMConv3d',
                    'SparseConvTensor', 'SparseSequential',
                    'SparseInverseConv3d', 'SparseMaxPool3d']:
            setattr(spconv_pytorch, cls, type(cls, (), {}))

    numba = stub('numba')
    numba.jit = _passthrough_jit
    numba.njit = _passthrough_jit
    numba.prange = range
    numba_cuda = stub('numba.cuda')
    numba_cuda.jit = lambda *a, **k: (lambda fn: _CudaKernelStub(fn)) \
        if not (len(a) == 1 and callable(a[0])) else _CudaKernelStub(a[0])
    numba.cuda = numba_cuda
    for t in ['float32', 'float64', 'int32', 'int64', 'boolean']:
        setattr(numba, t, t)
        setattr(numba_cuda, t, t)
    numba_cuda.local = types.SimpleNamespace(array=lambda shape, dtype: None)

    # unbuilt CUDA extension modules referenced at import time
    for ext in [
        'pcdet.ops.roiaware_pool3d.roiaware_pool3d_cuda',
        'pcdet.ops.iou3d_nms.iou3d_nms_cuda',
        'pcdet.ops.pointnet2.pointnet2_batch.pointnet2_batch_cuda',
        'pcdet.ops.pointnet2.pointnet2_stack.pointnet2_stack_cuda',
        'pcdet.ops.roipoint_pool3d.roipoint_pool3d_cuda',
        'pcdet.ops.bev_pool.bev_pool_ext',
        'pcdet.ops.ingroup_inds.ingroup_inds_cuda',
    ]:
        stub(ext)


class _AnyAttrModule(types.ModuleType):
    """A stub module that fabricates submodule-ish attributes on demand so
    `from torchvision.models import X` style imports succeed."""

    def __getattr__(self, name):
        if name.startswith('__'):
            raise AttributeError(name)
        child = _AnyAttrModule(self.__name__ + '.' + name)
        setattr(self, name, child)
        sys.modules.setdefault(child.__name__, child)
        return child


def load(module_path: str):
    """install() + import a pcdet module by dotted path, auto-stubbing any
    missing third-party leaf deps (torchvision, kornia, ...) the reference's
    eager registry imports pull in. Returns the module."""
    install()
    import importlib
    for _ in range(20):
        try:
            return importlib.import_module(module_path)
        except ModuleNotFoundError as e:
            root = e.name.split('.')[0]
            if root in ('pcdet',) or root in sys.modules:
                raise
            mod = _AnyAttrModule(e.name)
            sys.modules[e.name] = mod
            if '.' in e.name:
                sys.modules.setdefault(root, _AnyAttrModule(root))
    return importlib.import_module(module_path)
