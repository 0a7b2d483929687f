"""EncodeProject torch-import structural consistency.

torchvision is not installed here, so we synthesize a torchvision-style
state_dict with the correct names/shapes (inverse of the importer's
transposes) from a randomly-initialised EncodeProject, import it, and check
the model reproduces the source params exactly.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from dynamorph_tpu.models.resnet_simclr import EncodeProject
from dynamorph_tpu.models.torch_import import import_encode_project


def _to_torch_sd(params, state, arch):
    """Inverse mapping: our pytree -> torchvision-style numpy state_dict."""
    sd = {}

    def put_conv(name, p):
        sd[name + ".weight"] = np.transpose(np.asarray(p["kernel"]),
                                            (3, 2, 0, 1))

    def put_bn(name, p, s):
        sd[name + ".weight"] = np.asarray(p["scale"])
        sd[name + ".bias"] = np.asarray(p.get(
            "offset", np.zeros_like(p["scale"])))
        sd[name + ".running_mean"] = np.asarray(s["mean"])
        sd[name + ".running_var"] = np.asarray(s["var"])

    put_conv("convnet.conv1", params["stem"]["conv"])
    put_bn("convnet.bn1", params["stem"]["bn"], state["stem"]["bn"])
    for li in range(1, 5):
        for b, (p, s) in enumerate(zip(params[f"layer{li}"],
                                       state[f"layer{li}"])):
            prefix = f"convnet.layer{li}.{b}"
            for ci in (1, 2, 3):
                if f"conv{ci}" in p:
                    put_conv(f"{prefix}.conv{ci}", p[f"conv{ci}"])
                    put_bn(f"{prefix}.bn{ci}", p[f"bn{ci}"], s[f"bn{ci}"])
            if "down" in p:
                put_conv(f"{prefix}.downsample.0", p["down"])
                put_bn(f"{prefix}.downsample.1", p["down_bn"], s["down_bn"])
    sd["projection.fc1.weight"] = np.transpose(
        np.asarray(params["proj"]["fc1"]["weight"]), (1, 0))
    put_bn("projection.bn1", params["proj"]["bn1"], state["proj"]["bn1"])
    sd["projection.fc2.weight"] = np.transpose(
        np.asarray(params["proj"]["fc2"]["weight"]), (1, 0))
    put_bn("projection.bn2", params["proj"]["bn2"], state["proj"]["bn2"])
    return sd


@pytest.mark.parametrize("arch", ["ResNet18", "ResNet50"])
def test_encode_project_import_roundtrip(rng, arch):
    model = EncodeProject(arch=arch, num_inputs=2, cifar_head=False)
    params, state = jax.jit(model.init)(jax.random.PRNGKey(3))
    sd = _to_torch_sd(params, state, arch)
    params2, state2 = import_encode_project(sd, arch=arch)

    # structure matches exactly
    leaves1 = jax.tree_util.tree_leaves_with_path(params)
    flat2 = dict(jax.tree_util.tree_leaves_with_path(params2))
    # our stem conv has no bias; imported likewise. Compare kernels pointwise.
    for path, leaf in leaves1:
        assert path in flat2, path
        np.testing.assert_allclose(np.asarray(leaf),
                                   np.asarray(flat2[path]), atol=0,
                                   err_msg=str(path))

    # imported weights drive the model identically
    x = jnp.asarray(rng.rand(2, 2, 64, 64).astype(np.float32))
    z1, _ = model.encode_fn(params, state, x, out="z")
    z2, _ = model.encode_fn(params2, state2, x, out="z")
    np.testing.assert_allclose(np.asarray(z1), np.asarray(z2), atol=1e-6)
