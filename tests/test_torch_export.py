"""Round-trip: our params -> torch state_dict -> reference model -> same
latents (cross-pipeline checkpoint compatibility)."""
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from conftest import REFERENCE_DIR, has_reference

pytestmark = pytest.mark.skipif(
    not has_reference(), reason="reference checkout not available")

if has_reference():
    sys.path.insert(0, REFERENCE_DIR)
    from HiddenStateExtractor import vae as ref_vae

import jax
import jax.numpy as jnp

from dynamorph_tpu.models import VQVAEz16, VQVAEz32
from dynamorph_tpu.models.torch_export import (export_vqvae_z16,
                                               export_vqvae_z32)


@pytest.mark.parametrize("which", ["z16", "z32"])
def test_export_roundtrip_latents(rng, which):
    if which == "z16":
        model = VQVAEz16(num_embeddings=64, vq_impl="xla")
        ref_cls = ref_vae.VQ_VAE_z16
        export = export_vqvae_z16
    else:
        model = VQVAEz32(num_embeddings=64, vq_impl="xla")
        ref_cls = ref_vae.VQ_VAE_z32
        export = export_vqvae_z32
    params, state = jax.jit(model.init)(jax.random.PRNGKey(5))
    sd = export(params, state)

    tmodel = ref_cls(num_inputs=2, num_hiddens=16, num_residual_hiddens=32,
                     num_residual_layers=2, num_embeddings=64, device="cpu")
    tmodel.load_state_dict({k: torch.from_numpy(np.ascontiguousarray(v))
                            for k, v in sd.items()})
    tmodel.eval()

    x = rng.rand(3, 2, 128, 128).astype(np.float32)
    z_ours, _, idx_ours = model.encode(params, state, jnp.asarray(x))
    with torch.no_grad():
        z_ref = tmodel.enc(torch.from_numpy(x)).numpy()
        idx_ref = tmodel.vq.encode_inputs(torch.from_numpy(z_ref)).numpy()
    mse = float(np.mean((np.asarray(z_ours) - z_ref) ** 2))
    assert mse < 1e-5
    np.testing.assert_array_equal(np.asarray(idx_ours), idx_ref)


@pytest.mark.parametrize("which,nh,nrh,ne", [
    ("z16", 8, 16, 32), ("z16", 32, 64, 128),
    ("z32", 8, 16, 32), ("z32", 64, 64, 512),
])
def test_export_roundtrip_nondefault_widths(rng, which, nh, nrh, ne):
    """Exporter/importer must handle arbitrary widths, not just the default
    config: ours -> torch state_dict -> reference model -> same latents, and
    torch state_dict -> import_vqvae_* -> identical params."""
    from dynamorph_tpu.models.torch_import import (import_vqvae_z16,
                                                   import_vqvae_z32)

    if which == "z16":
        model = VQVAEz16(num_hiddens=nh, num_residual_hiddens=nrh,
                         num_embeddings=ne, vq_impl="xla")
        ref_cls, export, imp = ref_vae.VQ_VAE_z16, export_vqvae_z16, \
            import_vqvae_z16
    else:
        model = VQVAEz32(num_hiddens=nh, num_residual_hiddens=nrh,
                         num_embeddings=ne, vq_impl="xla")
        ref_cls, export, imp = ref_vae.VQ_VAE_z32, export_vqvae_z32, \
            import_vqvae_z32
    params, state = jax.jit(model.init)(jax.random.PRNGKey(7))
    sd = export(params, state)

    tmodel = ref_cls(num_inputs=2, num_hiddens=nh, num_residual_hiddens=nrh,
                     num_residual_layers=2, num_embeddings=ne, device="cpu")
    tmodel.load_state_dict({k: torch.from_numpy(np.ascontiguousarray(v))
                            for k, v in sd.items()})
    tmodel.eval()

    x = rng.rand(2, 2, 64, 64).astype(np.float32)
    z_ours, _, idx_ours = model.encode(params, state, jnp.asarray(x))
    with torch.no_grad():
        z_ref = tmodel.enc(torch.from_numpy(x)).numpy()
        idx_ref = tmodel.vq.encode_inputs(torch.from_numpy(z_ref)).numpy()
    assert float(np.mean((np.asarray(z_ours) - z_ref) ** 2)) < 1e-5
    np.testing.assert_array_equal(np.asarray(idx_ours), idx_ref)

    # import the exported dict back: params must match exactly
    p2, s2 = imp({k: np.asarray(v) for k, v in sd.items()})
    for (ka, va), (kb, vb) in zip(
            sorted(jax.tree_util.tree_leaves_with_path(params),
                   key=lambda t: str(t[0])),
            sorted(jax.tree_util.tree_leaves_with_path(p2),
                   key=lambda t: str(t[0]))):
        assert str(ka) == str(kb)
        np.testing.assert_array_equal(np.asarray(va), np.asarray(vb))
