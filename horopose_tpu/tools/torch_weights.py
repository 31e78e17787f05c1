"""PyTorch -> Flax weight converters.

Covers the external weight artifacts the reference depends on:
  - torchvision ImageNet ResNet state dicts (Resnet.py:69-92 loads them),
  - pose-HRNet w32 ImageNet weights (HRnet.py:572-603),
  - the reference's own trained checkpoints (.pk with model_state_dict;
    README.md model zoo) -> our FullNet/RootNet parameter trees,
  - CtRNet per-camera segmentation .pth files (mask_inference.py:35-44) ->
    our KeypointSegNet.

Tensor layout rules:
  conv weight   (O, I, kh, kw) -> (kh, kw, I, O)
  linear weight (O, I)         -> (I, O)
  batchnorm     weight/bias -> scale/bias; running_mean/var -> batch_stats
  conv-transpose (I, O, kh, kw) -> (kh, kw, I, O)  [flax ConvTranspose]

The converters take a plain {name: numpy array} dict, so torch is only
needed to *read* .pth/.pk files (tools/load_torch_file), not to convert.
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np


def load_torch_file(path: str) -> Dict[str, np.ndarray]:
    """Load a .pth/.pk checkpoint into {key: numpy}. Requires torch."""
    import torch
    payload = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(payload, dict) and "model_state_dict" in payload:
        payload = payload["model_state_dict"]
    if isinstance(payload, dict) and "state_dict" in payload:
        payload = payload["state_dict"]
    return {k: v.detach().numpy() for k, v in payload.items()
            if hasattr(v, "detach")}


def _conv(w: np.ndarray) -> np.ndarray:
    return np.transpose(w, (2, 3, 1, 0))


def _deconv(w: np.ndarray) -> np.ndarray:
    """torch ConvTranspose2d (in, out, kh, kw) -> flax ConvTranspose kernel
    (kh, kw, in, out) with a SPATIAL FLIP: flax's default
    (transpose_kernel=False) is a fractionally-strided convolution, which
    equals torch's gradient-of-conv semantics only with flipped taps
    (validated numerically in tests/test_torch_numeric_parity.py)."""
    return np.ascontiguousarray(np.transpose(w, (2, 3, 0, 1))[::-1, ::-1])


def _linear(w: np.ndarray) -> np.ndarray:
    return np.transpose(w)


class TreeBuilder:
    """Accumulates params/batch_stats nested dicts from flat assignments."""

    def __init__(self):
        self.params: Dict = {}
        self.batch_stats: Dict = {}

    def _set(self, root, path, value):
        d = root
        for k in path[:-1]:
            d = d.setdefault(k, {})
        d[path[-1]] = value

    def conv(self, path, sd, torch_key, transposed=False):
        w = sd[f"{torch_key}.weight"]
        self._set(self.params, path + ("kernel",),
                  _deconv(w) if transposed else _conv(w))
        if f"{torch_key}.bias" in sd:
            self._set(self.params, path + ("bias",), sd[f"{torch_key}.bias"])

    def linear(self, path, sd, torch_key):
        self._set(self.params, path + ("kernel",),
                  _linear(sd[f"{torch_key}.weight"]))
        if f"{torch_key}.bias" in sd:
            self._set(self.params, path + ("bias",), sd[f"{torch_key}.bias"])

    def bn(self, path, sd, torch_key):
        self._set(self.params, path + ("scale",), sd[f"{torch_key}.weight"])
        self._set(self.params, path + ("bias",), sd[f"{torch_key}.bias"])
        self._set(self.batch_stats, path + ("mean",),
                  sd[f"{torch_key}.running_mean"])
        self._set(self.batch_stats, path + ("var",),
                  sd[f"{torch_key}.running_var"])


# ---------------------------------------------------------------------------
# ResNet trunk (torchvision naming)


def convert_resnet(sd: Dict[str, np.ndarray], stage_sizes,
                   bottleneck: bool, prefix: str = "",
                   out_prefix: Tuple[str, ...] = ()) -> TreeBuilder:
    """torchvision resnet{18,34,50,...} state dict -> our ResNet tree.

    Our block creation order (models/resnet.py): Conv_0/BN_0 .. Conv_n/BN_n
    with the downsample conv/bn LAST.
    """
    tb = TreeBuilder()
    p = prefix
    tb.conv(out_prefix + ("conv1",), sd, f"{p}conv1")
    tb.bn(out_prefix + ("bn1",), sd, f"{p}bn1")
    n_convs = 3 if bottleneck else 2
    for stage, n_blocks in enumerate(stage_sizes):
        for i in range(n_blocks):
            tk = f"{p}layer{stage + 1}.{i}"
            fk = out_prefix + (f"layer{stage + 1}_{i}",)
            for c in range(n_convs):
                tb.conv(fk + (f"Conv_{c}",), sd, f"{tk}.conv{c + 1}")
                tb.bn(fk + (f"BatchNorm_{c}",), sd, f"{tk}.bn{c + 1}")
            if f"{tk}.downsample.0.weight" in sd:
                tb.conv(fk + (f"Conv_{n_convs}",), sd, f"{tk}.downsample.0")
                tb.bn(fk + (f"BatchNorm_{n_convs}",), sd,
                      f"{tk}.downsample.1")
    return tb


def merge_into(variables: Dict, tb: TreeBuilder, strict_shapes: bool = True):
    """Merge converted subtrees into an initialized flax variables dict,
    verifying shapes. Returns the updated variables (new dict)."""
    def merge(dst, src, where):
        out = dict(dst)
        for k, v in src.items():
            if isinstance(v, dict):
                assert k in out, f"missing subtree {where}/{k}"
                out[k] = merge(out[k], v, f"{where}/{k}")
            else:
                assert k in out, f"missing leaf {where}/{k}"
                if strict_shapes:
                    assert out[k].shape == v.shape, \
                        f"shape mismatch at {where}/{k}: " \
                        f"{out[k].shape} vs {v.shape}"
                out[k] = v.astype(np.asarray(out[k]).dtype)
        return out

    new_vars = dict(variables)
    if tb.params:
        new_vars["params"] = merge(variables["params"], tb.params, "params")
    if tb.batch_stats:
        new_vars["batch_stats"] = merge(variables.get("batch_stats", {}),
                                        tb.batch_stats, "batch_stats")
    return new_vars


# ---------------------------------------------------------------------------
# HRNet (pose_hrnet naming, HRnet.py)


def convert_hrnet(sd: Dict[str, np.ndarray], prefix: str = "",
                  out_prefix: Tuple[str, ...] = (),
                  with_heads: bool = True) -> TreeBuilder:
    tb = TreeBuilder()
    p = prefix
    tb.conv(out_prefix + ("conv1",), sd, f"{p}conv1")
    tb.bn(out_prefix + ("bn1",), sd, f"{p}bn1")
    tb.conv(out_prefix + ("conv2",), sd, f"{p}conv2")
    tb.bn(out_prefix + ("bn2",), sd, f"{p}bn2")
    for i in range(4):  # layer1: 4 bottlenecks
        tk = f"{p}layer1.{i}"
        fk = out_prefix + (f"layer1_{i}",)
        for c in range(3):
            tb.conv(fk + (f"Conv_{c}",), sd, f"{tk}.conv{c + 1}")
            tb.bn(fk + (f"BatchNorm_{c}",), sd, f"{tk}.bn{c + 1}")
        if f"{tk}.downsample.0.weight" in sd:
            tb.conv(fk + ("Conv_3",), sd, f"{tk}.downsample.0")
            tb.bn(fk + ("BatchNorm_3",), sd, f"{tk}.downsample.1")

    def transition(tnum, n_prev, n_cur):
        for i in range(n_cur):
            base = f"{p}transition{tnum}.{i}"
            if f"{base}.0.weight" in sd:           # channel-adapting conv
                tb.conv(out_prefix + (f"transition{tnum}", f"t{i}"), sd,
                        f"{base}.0")
                tb.bn(out_prefix + (f"transition{tnum}", f"t{i}_bn"),
                      sd, f"{base}.1")
            elif f"{base}.0.0.weight" in sd:       # new deeper branch
                j = 0
                while f"{base}.{j}.0.weight" in sd:
                    tb.conv(out_prefix + (f"transition{tnum}",
                                          f"t{i}_d{j}"), sd, f"{base}.{j}.0")
                    tb.bn(out_prefix + (f"transition{tnum}",
                                        f"t{i}_d{j}_bn"), sd,
                          f"{base}.{j}.1")
                    j += 1

    def stage(snum, n_modules, n_branches):
        for m in range(n_modules):
            mk = f"{p}stage{snum}.{m}"
            fk = out_prefix + (f"stage{snum}_m{m}",)
            for b in range(n_branches):
                for blk in range(4):
                    tk = f"{mk}.branches.{b}.{blk}"
                    bk = fk + (f"branch{b}_block{blk}",)
                    for c in range(2):
                        tb.conv(bk + (f"Conv_{c}",), sd, f"{tk}.conv{c + 1}")
                        tb.bn(bk + (f"BatchNorm_{c}",), sd,
                              f"{tk}.bn{c + 1}")
            # fuse layers: torch fuse_layers.{i}.{j}
            n_out = n_branches
            for i in range(n_out):
                for j in range(n_branches):
                    base = f"{mk}.fuse_layers.{i}.{j}"
                    if j > i and f"{base}.0.weight" in sd:
                        tb.conv(fk + ("fuse", f"up{i}_{j}"), sd, f"{base}.0")
                        tb.bn(fk + ("fuse", f"up{i}_{j}_bn"), sd,
                              f"{base}.1")
                    elif j < i:
                        for k in range(i - j):
                            if f"{base}.{k}.0.weight" in sd:
                                tb.conv(fk + ("fuse", f"down{i}_{j}_{k}"),
                                        sd, f"{base}.{k}.0")
                                tb.bn(fk + ("fuse", f"down{i}_{j}_{k}_bn"),
                                      sd, f"{base}.{k}.1")

    transition(1, 1, 2)
    stage(2, 1, 2)
    transition(2, 2, 3)
    stage(3, 4, 3)
    transition(3, 3, 4)
    stage(4, 3, 4)

    if with_heads:
        if f"{p}final_layer.weight" in sd:
            tb.conv(out_prefix + ("final_layer",), sd, f"{p}final_layer")
        for i in range(4):
            if f"{p}incre_modules.{i}.0.conv1.weight" in sd:
                tk = f"{p}incre_modules.{i}.0"
                fk = out_prefix + (f"incre{i}",)
                for c in range(3):
                    tb.conv(fk + (f"Conv_{c}",), sd, f"{tk}.conv{c + 1}")
                    tb.bn(fk + (f"BatchNorm_{c}",), sd, f"{tk}.bn{c + 1}")
                if f"{tk}.downsample.0.weight" in sd:
                    tb.conv(fk + ("Conv_3",), sd, f"{tk}.downsample.0")
                    tb.bn(fk + ("BatchNorm_3",), sd, f"{tk}.downsample.1")
        for i in range(3):
            if f"{p}downsamp_modules.{i}.0.weight" in sd:
                tb.conv(out_prefix + (f"downsamp{i}",), sd,
                        f"{p}downsamp_modules.{i}.0")
                tb.bn(out_prefix + (f"downsamp{i}_bn",), sd,
                      f"{p}downsamp_modules.{i}.1")
        if f"{p}final_feat_layer.0.weight" in sd:
            tb.conv(out_prefix + ("final_feat",), sd,
                    f"{p}final_feat_layer.0")
            tb.bn(out_prefix + ("final_feat_bn",), sd,
                  f"{p}final_feat_layer.1")
    return tb


# ---------------------------------------------------------------------------
# FullNet (reference RootNetwithRegInt checkpoints, full_net.py)


def convert_fullnet_reference_checkpoint(
        sd: Dict[str, np.ndarray],
        backbone_name: str = "resnet50",
        rootnet_backbone_name: str = "hrnet32") -> TreeBuilder:
    """Map a reference RootNetwithRegInt state dict onto our FullNet tree."""
    from horopose_tpu.models.resnet import RESNET_SPECS
    tb = TreeBuilder()
    # reg backbone
    if backbone_name.startswith("resnet") or backbone_name == "resnet":
        block, sizes = RESNET_SPECS[backbone_name]
        sub = convert_resnet(sd, sizes, block == "bottleneck",
                             prefix="reg_backbone.",
                             out_prefix=("reg_backbone",))
    else:
        sub = convert_hrnet(sd, prefix="reg_backbone.",
                            out_prefix=("reg_backbone",))
    tb.params.update(sub.params)
    tb.batch_stats.update(sub.batch_stats)
    # rootnet backbone
    if rootnet_backbone_name.startswith("hrnet"):
        sub = convert_hrnet(sd, prefix="rootnet_backbone.",
                            out_prefix=("rootnet_backbone",))
    else:
        block, sizes = RESNET_SPECS[rootnet_backbone_name]
        sub = convert_resnet(sd, sizes, block == "bottleneck",
                             prefix="rootnet_backbone.",
                             out_prefix=("rootnet_backbone",))
    tb.params.update(sub.params)
    tb.batch_stats.update(sub.batch_stats)

    # deconv stack: torch Sequential indices 0/3/6 are the deconvs, 1/4/7 BN
    for i, (ci, bi) in enumerate(((0, 1), (3, 4), (6, 7))):
        if f"deconv_layers.{ci}.weight" in sd:
            tb.conv((f"deconv{i}",), sd, f"deconv_layers.{ci}",
                    transposed=True)
            tb.bn((f"deconv{i}_bn",), sd, f"deconv_layers.{bi}")
    if "final_layer.weight" in sd:
        tb.conv(("final_layer",), sd, "final_layer")
    # joint-map variant (reg_joint_map): conv stack + 1x1 head
    # (full_net.py:228-238 _make_joint_conv_layer, indices 0/3/6 + BN 1/4/7)
    for i, (ci, bi) in enumerate(((0, 1), (3, 4), (6, 7))):
        if f"joint_conv_layers.{ci}.weight" in sd:
            tb.conv((f"joint_conv{i}",), sd, f"joint_conv_layers.{ci}")
            tb.bn((f"joint_conv{i}_bn",), sd, f"joint_conv_layers.{bi}")
    if "joint_final_layer.weight" in sd:
        tb.conv(("joint_final_layer",), sd, "joint_final_layer")

    for name in ("fc_pose_1", "fc_pose_2", "decpose", "fc_rot_1", "fc_rot_2",
                 "fc_rot_3", "fc_rot_4", "fc_rot_5", "fc_rot_6", "decrot",
                 "depth_fc_d1", "depth_fc_d2", "depth_fc_u1", "depth_fc_u2"):
        if f"{name}.weight" in sd:
            tb.linear((name,), sd, name)
    if "depth_bn.weight" in sd:
        tb.bn(("depth_bn",), sd, "depth_bn")
    # depth_layer is a 1x1 conv on a (1,1) map in the reference == Dense here
    if "depth_layer.weight" in sd:
        w = sd["depth_layer.weight"]           # (out, in, 1, 1)
        tb._set(tb.params, ("depth_layer", "kernel"),
                np.transpose(w[:, :, 0, 0]))
        tb._set(tb.params, ("depth_layer", "bias"), sd["depth_layer.bias"])
    return tb


def convert_rootnet_reference_checkpoint(
        sd: Dict[str, np.ndarray],
        backbone_name: str = "resnet50") -> TreeBuilder:
    """Stage-1 DepthNet (RootNet) state dict -> our RootNet tree.

    Reference naming (/root/reference/lib/models/depth_net.py:11-168):
    backbone.*, deconv_layers.{0,3,6} (+BN at 1/4/7), xy_layer,
    depth_fc1..5 + depth_bn1..4, depth_layer, offset_layer. Our backbone
    submodule is auto-named ResNet_0 / HRNet_0 (depth_net.py builds it
    without an explicit name)."""
    from horopose_tpu.models.resnet import RESNET_SPECS
    tb = TreeBuilder()
    if backbone_name.startswith("hrnet"):
        sub = convert_hrnet(sd, prefix="backbone.", out_prefix=("HRNet_0",))
    else:
        block, sizes = RESNET_SPECS[backbone_name]
        sub = convert_resnet(sd, sizes, block == "bottleneck",
                             prefix="backbone.", out_prefix=("ResNet_0",))
    tb.params.update(sub.params)
    tb.batch_stats.update(sub.batch_stats)
    for i, (ci, bi) in enumerate(((0, 1), (3, 4), (6, 7))):
        if f"deconv_layers.{ci}.weight" in sd:
            tb.conv((f"deconv{i}",), sd, f"deconv_layers.{ci}",
                    transposed=True)
            tb.bn((f"deconv{i}_bn",), sd, f"deconv_layers.{bi}")
    if "xy_layer.weight" in sd:
        tb.conv(("xy_layer",), sd, "xy_layer")
    for i in range(1, 6):
        if f"depth_fc{i}.weight" in sd:
            tb.linear((f"fc{i}",), sd, f"depth_fc{i}")
        if f"depth_bn{i}.weight" in sd:
            tb.bn((f"fc{i}_bn",), sd, f"depth_bn{i}")
    for name in ("depth_layer", "offset_layer"):
        if f"{name}.weight" in sd:
            w = sd[f"{name}.weight"]           # (out, in, 1, 1) 1x1 conv
            tb._set(tb.params, (name, "kernel"), np.transpose(w[:, :, 0, 0]))
            tb._set(tb.params, (name, "bias"), sd[f"{name}.bias"])
    return tb


# ---------------------------------------------------------------------------
# CtRNet segmentation teacher (keypoint_seg_resnet.py)


def convert_ctrnet_seg(sd: Dict[str, np.ndarray]) -> TreeBuilder:
    """CtRNet KeyPointSegNet .pth -> our KeypointSegNet tree.

    torch names: backbone.0.{conv1,bn1,layer1..4} (dilated resnet50),
    read_out.kps_score_lowres (deconv), classifer.0.{0..4} (ASPP) and
    classifer.0 tail convs.
    """
    tb = TreeBuilder()
    p = "backbone.0."
    sub = convert_resnet(sd, (3, 4, 6, 3), True, prefix=p,
                         out_prefix=("backbone",))
    tb.params.update(sub.params)
    tb.batch_stats.update(sub.batch_stats)
    if "read_out.kps_score_lowres.weight" in sd:
        tb.conv(("read_out",), sd, "read_out.kps_score_lowres",
                transposed=True)
    # KeyPointSegNet wraps the DeepLabHead in an extra Sequential
    # (`self.classifer = Sequential(deeplabv3.children()[1])`,
    # keypoint_seg_resnet.py:127), so real checkpoints nest one level:
    # classifer.0.0 = ASPP, .0.1 conv3x3, .0.2 bn, .0.4 final 1x1. The flat
    # layout (classifer.0 = ASPP, .1/.2/.4 tail) is kept as a fallback for
    # hand-flattened dumps.
    head = "classifer.0" if "classifer.0.0.convs.0.0.weight" in sd \
        else "classifer"
    aspp = f"{head}.0.convs"
    # ASPP branch creation order in our module: 1x1, rate branches, pool
    if f"{aspp}.0.0.weight" in sd:
        convs = [(f"{aspp}.0.0", f"{aspp}.0.1")]
        for r in (1, 2, 3):
            convs.append((f"{aspp}.{r}.0", f"{aspp}.{r}.1"))
        convs.append((f"{aspp}.4.1", f"{aspp}.4.2"))      # pooling branch
        convs.append((f"{head}.0.project.0", f"{head}.0.project.1"))
        for i, (ck, bk) in enumerate(convs):
            if f"{ck}.weight" in sd:
                tb.conv(("aspp", f"Conv_{i}"), sd, ck)
                tb.bn(("aspp", f"BatchNorm_{i}"), sd, bk)
    if f"{head}.1.weight" in sd:
        tb.conv(("cls_conv",), sd, f"{head}.1")
        tb.bn(("cls_bn",), sd, f"{head}.2")
    if f"{head}.4.weight" in sd:
        tb.conv(("cls_final",), sd, f"{head}.4")
    return tb


def lenient_merge(dst: Dict, src: Dict):
    """strict=False merge (reference semantics: Resnet.py:69-92 and
    HRnet.py:572-603 load ImageNet state dicts with strict=False): copy every
    src leaf whose path exists in dst with a matching shape; skip the rest.

    Returns (new_dst, n_loaded, skipped_paths)."""
    skipped = []
    n_loaded = [0]

    def rec(d, s, where):
        out = dict(d)
        for k, v in s.items():
            if k not in out:
                skipped.append(f"{where}/{k}")
                continue
            if isinstance(v, dict):
                if not isinstance(out[k], dict):
                    skipped.append(f"{where}/{k}")
                    continue
                out[k] = rec(out[k], v, f"{where}/{k}")
            else:
                ref = np.asarray(out[k])
                if ref.shape != np.shape(v):
                    skipped.append(f"{where}/{k}")
                    continue
                out[k] = np.asarray(v, dtype=ref.dtype)
                n_loaded[0] += 1
        return out

    new_dst = rec(dst, src, "")
    return new_dst, n_loaded[0], skipped


def load_backbone_weights(path: str, backbone_name: str):
    """Read a backbone weight artifact into (params, batch_stats) subtrees.

    Accepts either a flax msgpack written by tools/convert (a standalone
    backbone variables tree) or a raw torch .pth/.pt/.pk state dict, which is
    converted on the fly with convert_resnet/convert_hrnet."""
    if path.endswith(".msgpack"):
        from flax import serialization
        with open(path, "rb") as f:
            tree = serialization.msgpack_restore(f.read())
        return tree.get("params", {}), tree.get("batch_stats", {})
    sd = load_torch_file(path)
    if backbone_name.startswith("hrnet"):
        tb = convert_hrnet(sd)
    else:
        from horopose_tpu.models.resnet import RESNET_SPECS
        block, sizes = RESNET_SPECS[backbone_name]
        tb = convert_resnet(sd, sizes, block == "bottleneck")
    return tb.params, tb.batch_stats


def save_msgpack(variables: Dict, path: str):
    from flax import serialization
    with open(path, "wb") as f:
        f.write(serialization.msgpack_serialize(
            serialization.to_state_dict(variables)))
