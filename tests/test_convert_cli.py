"""Converter CLI end-to-end: torch.save a synthesized state dict, run the
CLI, and load the resulting msgpack back into a model."""

import subprocess
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from test_torch_weights import synth_torch_resnet50_sd  # noqa: E402


def test_convert_cli_resnet50(tmp_path, rng):
    sd = synth_torch_resnet50_sd(rng)
    src = tmp_path / "resnet50.pth"
    torch.save({k: torch.from_numpy(v) for k, v in sd.items()}, str(src))
    dst = tmp_path / "resnet50.msgpack"
    r = subprocess.run(
        [sys.executable, "-m", "horopose_tpu.tools.convert", "resnet50",
         str(src), str(dst)],
        capture_output=True, text=True, timeout=570, cwd="/root/repo",
        env={"PATH": "/usr/bin:/bin", "JAX_PLATFORMS": "cpu",
             "PYTHONPATH": "/root/repo", "HOME": "/root"})
    assert r.returncode == 0, r.stderr[-2000:]
    assert dst.exists()
    # restore and run
    from flax import serialization
    import jax
    import jax.numpy as jnp
    from horopose_tpu.models import get_resnet
    payload = serialization.msgpack_restore(dst.read_bytes())
    model = get_resnet("resnet50")
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)),
                           train=False)
    variables = serialization.from_state_dict(variables, payload)
    out = model.apply(variables, jnp.zeros((1, 32, 32, 3)), train=False)
    assert out.shape == (1, 1, 1, 2048)
    np.testing.assert_allclose(
        np.asarray(variables["params"]["conv1"]["kernel"]),
        np.transpose(sd["conv1.weight"], (2, 3, 1, 0)))
