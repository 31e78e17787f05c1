"""Import harness for the REFERENCE's own torch model code (numeric parity).

The strongest in-environment evidence for the 0.5-AUC north star (no DREAM
data / model-zoo weights here) is bit-level forward agreement between the
reference's torch modules and our Flax rebuild through the weight
converters. This helper makes the reference code importable unmodified:

  - appends /root/reference/lib to sys.path (namespace packages: models,
    dataset, utils),
  - stubs the import surface of wheels absent from this container
    (easydict, torchvision, kornia) — just enough to import, never to
    compute,
  - pre-seeds `utils.urdf_robot` with a bridge module whose URDFRobot
    delegates FK to OUR compiled-plan kinematics (torch<->numpy<->jax).
    The reference's real FK (vendored urdfpytorch) needs trimesh + the
    robots' URDF/mesh files, neither of which exists here; our FK is
    validated against a numpy oracle in test_fk.py, so bridging it keeps
    the NETWORK code under test 100% the reference's while FK is shared —
    i.e. the xyz_fk comparison proves the FK *inputs* (pose/rot/trans)
    agree, not the FK itself,
  - no-ops `.cuda()` (the reference pins tensors to GPU 0:
    transforms.py:51-73, integral.py:73; this container's torch is
    CPU-only).

Nothing here copies reference code — it IMPORTS it, for tests only.
"""

from __future__ import annotations

import os
import sys
import types

import numpy as np
import torch

REF_LIB = "/root/reference/lib"
_ready = False


class EasyDict(dict):
    """Minimal easydict.EasyDict clone (attribute<->item mirrored dict)."""

    def __init__(self, d=None, **kwargs):
        super().__init__()
        d = dict(d or {}, **kwargs)
        for k, v in d.items():
            setattr(self, k, v)

    def __setattr__(self, name, value):
        if isinstance(value, (list, tuple)):
            value = type(value)(self.__class__(x) if isinstance(x, dict)
                                else x for x in value)
        elif isinstance(value, dict) and not isinstance(value, EasyDict):
            value = self.__class__(value)
        super().__setattr__(name, value)
        super().__setitem__(name, value)

    __setitem__ = __setattr__

    def __getattr__(self, name):
        try:
            return self[name]
        except KeyError as e:
            raise AttributeError(name) from e


def _autograd_bridge(jax_fn, *tensors):
    """Run a jax function on torch tensors WITH gradient flow: forward
    evaluates the jax function, backward applies its jax VJP to the torch
    cotangent. Lets torch autograd differentiate THROUGH the bridged FK, so
    reference-vs-ours gradient parity tests can include the FK-dependent
    losses (the FK VJP itself is shared — jax autodiff of oracle-tested FK
    code — while everything up- and downstream stays framework-native)."""
    import jax
    import jax.numpy as jnp

    class _F(torch.autograd.Function):
        @staticmethod
        def forward(ctx, *args):
            jargs = tuple(jnp.asarray(np.asarray(
                a.detach().cpu().numpy(), np.float32)) for a in args)
            out, vjp = jax.vjp(jax_fn, *jargs)
            ctx._vjp = vjp
            return torch.from_numpy(np.asarray(out, np.float32))

        @staticmethod
        def backward(ctx, g):
            cots = ctx._vjp(jnp.asarray(np.asarray(
                g.detach().cpu().numpy(), np.float32)))
            return tuple(torch.from_numpy(np.asarray(c, np.float32))
                         for c in cots)

    return _F.apply(*tensors)


class BridgeURDFRobot:
    """Drop-in for the reference's URDFRobot FK surface, backed by our
    compiled-plan kinematics (horopose_tpu/kinematics). Differentiable:
    torch autograd flows through the bridged jax FK via its VJP."""

    def __init__(self, robot_type):
        from horopose_tpu import constants as C
        from horopose_tpu.kinematics import Robot
        self._robot = Robot(robot_type)
        # surface the attributes the reference engine/metrics read
        # (function.py:103-106, metrics.py:36-37,84)
        self.robot_type = robot_type
        self.dof = self._robot.dof
        self.link_names = list(C.KEYPOINT_NAMES[robot_type])

    def get_keypoints(self, pose, rot, trans):
        return _autograd_bridge(self._robot.get_keypoints, pose, rot, trans)

    def get_keypoints_root(self, pose, rot, trans, root=0):
        def fn(p, r, t):
            return self._robot.get_keypoints_root(p, r, t, root=int(root))
        return _autograd_bridge(fn, pose, rot, trans)

    def get_keypoints_only_fk(self, pose):
        return _autograd_bridge(self._robot.get_keypoints_only_fk, pose)

    def get_rotation_at_specific_root(self, pose, rot, trans, root=0):
        def fn(p, r, t):
            return self._robot.get_rotation_at_specific_root(
                p, r, t, root=int(root))
        return _autograd_bridge(fn, pose, rot, trans)


def _stub_module(name, **attrs):
    if name in sys.modules:
        return sys.modules[name]
    mod = types.ModuleType(name)
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules[name] = mod
    if "." in name:  # expose as attribute of the parent stub, if any
        parent, child = name.rsplit(".", 1)
        if parent in sys.modules:
            setattr(sys.modules[parent], child, mod)
    return mod


def setup_reference_imports():
    """Idempotent: prepare sys.path/sys.modules for reference imports."""
    global _ready
    if _ready:
        return
    _stub_module("easydict", EasyDict=EasyDict)
    _stub_module("torchvision")
    _stub_module("torchvision.transforms")
    _stub_module("torchvision.models")
    _stub_module("torchvision.ops")
    _stub_module("kornia")

    class _AverageValueMeter:  # torchnet.meter surface used by function.py
        def __init__(self):
            self.n, self.s = 0, 0.0

        def add(self, v, n=1):
            self.n += n
            self.s += float(v) * n

        def value(self):
            return (self.s / max(self.n, 1), 0.0)

        def reset(self):
            self.n, self.s = 0, 0.0
    _stub_module("torchnet")
    _stub_module("torchnet.meter", AverageValueMeter=_AverageValueMeter)
    urdf_stub = _stub_module("utils.urdf_robot", URDFRobot=BridgeURDFRobot)
    urdf_stub.__package__ = "utils"
    # the reference hard-pins device 0 (`.cuda()`, `.cuda(device=0)`) —
    # CPU-only torch here, so make those identity ops
    torch.Tensor.cuda = lambda self, *a, **k: self
    torch.nn.Module.cuda = lambda self, *a, **k: self
    if REF_LIB not in sys.path:
        sys.path.append(REF_LIB)
    # lib.core.function imports via the `lib.` namespace (lib.dataset.const,
    # lib.utils.BPnP, ...), so the reference ROOT must be importable too
    ref_root = os.path.dirname(REF_LIB)
    if ref_root not in sys.path:
        sys.path.append(ref_root)
    _ready = True


def import_reference_bpnp():
    """Import the reference's REAL lib.utils.BPnP (cv2-backed) on CPU-only
    torch. BPnP.py:2 builds a CUDA tensor at module import (a lazy-wrapper
    workaround in the reference); temporarily strip the device kwarg from
    torch.tensor so the import succeeds, then restore. Replaces any stub
    previously installed under the same module name, and returns the module
    so callers can rebind `ref_function.BPnP_m3d` (function.py:9 binds the
    NAME at import time)."""
    import importlib

    setup_reference_imports()
    mod = sys.modules.get("lib.utils.BPnP")
    if mod is not None and getattr(mod, "__file__", None):
        return mod  # the real one is already in
    sys.modules.pop("lib.utils.BPnP", None)
    orig_tensor = torch.tensor

    def patched(*a, **k):
        k.pop("device", None)
        return orig_tensor(*a, **k)

    torch.tensor = patched
    try:
        mod = importlib.import_module("lib.utils.BPnP")
    finally:
        torch.tensor = orig_tensor
    return mod


def randomize_state_dict(sd, rng, skip=("init_pose", "init_rot")):
    """Fresh random values for every param AND BatchNorm running stat —
    converter bugs in BN stats/eps/layout must show up, not hide behind
    default zeros/ones. Buffers in `skip` keep their reference-derived
    values (they are constants on our side too)."""
    out = {}
    for k, v in sd.items():
        if any(s in k for s in skip) or "num_batches_tracked" in k:
            out[k] = v
            continue
        shape = tuple(v.shape)
        if k.endswith("running_var"):
            val = rng.rand(*shape) + 0.5
        elif k.endswith("running_mean"):
            val = rng.randn(*shape) * 0.1
        elif k.endswith(".bias") or v.ndim == 1:
            val = rng.randn(*shape) * 0.1
        else:
            val = rng.randn(*shape) * 0.05
        out[k] = torch.from_numpy(np.asarray(val, np.float32))
    return out


def to_numpy_sd(model):
    return {k: v.detach().cpu().numpy()
            for k, v in model.state_dict().items()
            if "num_batches_tracked" not in k}


def rel_err(a, b):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    scale = max(np.abs(b).max(), 1e-6)
    return float(np.abs(a - b).max() / scale)
