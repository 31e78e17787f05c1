"""HRNet converter structural validation: synthesize a torch pose-hrnet-w32
state dict (exact key naming of backbones/HRnet.py) and require that the
converter (a) merges without any missing-path/shape assertion and (b) covers
EVERY parameter leaf of our Flax HRNet — so neither side has unmapped or
misnamed weights."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from horopose_tpu.models.hrnet import get_hrnet
from horopose_tpu.tools.torch_weights import convert_hrnet, merge_into

def synth_pose_hrnet_sd(rng, num_joints=7, depth_dim=64, width=32):
    W = width
    C2 = [W, 2 * W]
    C3 = [W, 2 * W, 4 * W]
    C4 = [W, 2 * W, 4 * W, 8 * W]
    sd = {}

    def conv(name, o, i, k):
        sd[f"{name}.weight"] = rng.randn(o, i, k, k).astype(np.float32)

    def conv_b(name, o, i, k):
        conv(name, o, i, k)
        sd[f"{name}.bias"] = rng.randn(o).astype(np.float32)

    def bn(name, c):
        sd[f"{name}.weight"] = rng.rand(c).astype(np.float32)
        sd[f"{name}.bias"] = rng.randn(c).astype(np.float32)
        sd[f"{name}.running_mean"] = rng.randn(c).astype(np.float32)
        sd[f"{name}.running_var"] = (rng.rand(c) + 0.5).astype(np.float32)

    conv("conv1", 64, 3, 3)
    bn("bn1", 64)
    conv("conv2", 64, 64, 3)
    bn("bn2", 64)
    # layer1: 4 bottlenecks 64->256
    in_ch = 64
    for i in range(4):
        b = f"layer1.{i}"
        conv(f"{b}.conv1", 64, in_ch, 1)
        bn(f"{b}.bn1", 64)
        conv(f"{b}.conv2", 64, 64, 3)
        bn(f"{b}.bn2", 64)
        conv(f"{b}.conv3", 256, 64, 1)
        bn(f"{b}.bn3", 256)
        if i == 0:
            conv(f"{b}.downsample.0", 256, 64, 1)
            bn(f"{b}.downsample.1", 256)
        in_ch = 256

    def transition(tnum, prev, cur):
        for i, ch in enumerate(cur):
            if i < len(prev):
                if ch != prev[i]:
                    conv(f"transition{tnum}.{i}.0", ch, prev[i], 3)
                    bn(f"transition{tnum}.{i}.1", ch)
            else:
                for j in range(i + 1 - len(prev)):
                    out_ch = ch if j == i - len(prev) else prev[-1]
                    conv(f"transition{tnum}.{i}.{j}.0", out_ch, prev[-1], 3)
                    bn(f"transition{tnum}.{i}.{j}.1", out_ch)

    def stage(snum, n_modules, channels, last_multi=True):
        nb = len(channels)
        for m in range(n_modules):
            mk = f"stage{snum}.{m}"
            for b in range(nb):
                for blk in range(4):
                    tk = f"{mk}.branches.{b}.{blk}"
                    conv(f"{tk}.conv1", channels[b], channels[b], 3)
                    bn(f"{tk}.bn1", channels[b])
                    conv(f"{tk}.conv2", channels[b], channels[b], 3)
                    bn(f"{tk}.bn2", channels[b])
            for i in range(nb):
                for j in range(nb):
                    base = f"{mk}.fuse_layers.{i}.{j}"
                    if j > i:
                        conv(f"{base}.0", channels[i], channels[j], 1)
                        bn(f"{base}.1", channels[i])
                    elif j < i:
                        for k in range(i - j):
                            last = k == i - j - 1
                            out_ch = channels[i] if last else channels[j]
                            conv(f"{base}.{k}.0", out_ch, channels[j], 3)
                            bn(f"{base}.{k}.1", out_ch)

    transition(1, [256], C2)
    stage(2, 1, C2)
    transition(2, C2, C3)
    stage(3, 4, C3)
    transition(3, C3, C4)
    stage(4, 3, C4)

    # heads
    conv_b("final_layer", num_joints * depth_dim, C4[0], 1)
    head = [32, 64, 128, 256]
    for i in range(4):
        b = f"incre_modules.{i}.0"
        conv(f"{b}.conv1", head[i], C4[i], 1)
        bn(f"{b}.bn1", head[i])
        conv(f"{b}.conv2", head[i], head[i], 3)
        bn(f"{b}.bn2", head[i])
        conv(f"{b}.conv3", head[i] * 4, head[i], 1)
        bn(f"{b}.bn3", head[i] * 4)
        conv(f"{b}.downsample.0", head[i] * 4, C4[i], 1)
        bn(f"{b}.downsample.1", head[i] * 4)
    for i in range(3):
        conv_b(f"downsamp_modules.{i}.0", head[i + 1] * 4, head[i] * 4, 3)
        bn(f"downsamp_modules.{i}.1", head[i + 1] * 4)
    conv_b("final_feat_layer.0", 2048, head[3] * 4, 1)
    bn("final_feat_layer.1", 2048)
    return sd


def _leaf_paths(tree, prefix=()):
    out = []
    for k, v in tree.items():
        if isinstance(v, dict):
            out += _leaf_paths(v, prefix + (k,))
        else:
            out.append(prefix + (k,))
    return out


@pytest.mark.parametrize("width", [32, 48])
def test_hrnet_converter_full_coverage(rng, width):
    model = get_hrnet(width, num_joints=7, depth_dim=64, generate_hm=True,
                      generate_feat=True)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 64, 64, 3)),
                           train=False)
    sd = synth_pose_hrnet_sd(rng, width=width)
    tb = convert_hrnet(sd)
    # (a) every converted path exists with the right shape
    new_vars = merge_into(variables, tb)
    # (b) the converter covers EVERY flax param leaf
    want = set(_leaf_paths(variables["params"]))
    got = set(_leaf_paths(tb.params))
    missing = want - got
    assert not missing, sorted(missing)[:10]
    want_bs = set(_leaf_paths(variables["batch_stats"]))
    got_bs = set(_leaf_paths(tb.batch_stats))
    assert not (want_bs - got_bs), sorted(want_bs - got_bs)[:10]
    # (c) the model still runs with converted weights
    hm, feat = model.apply(new_vars, jnp.zeros((1, 64, 64, 3)), train=False)
    assert feat.shape == (1, 2048)
