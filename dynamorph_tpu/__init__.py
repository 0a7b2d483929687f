"""dynamorph_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework for learning
morphodynamic states of live cells from label-free microscopy.

Re-designed from scratch for TPU hardware with the same capabilities as
mehta-lab/dynamorph (reference layout documented in SURVEY.md):

- ``dynamorph_tpu.core``     array conventions, device meshes, rng
- ``dynamorph_tpu.nn``       functional NN layers with torch-exact geometry
- ``dynamorph_tpu.config``   typed YAML config system
- ``dynamorph_tpu.io``       TIFF/npy/pickle IO, site discovery
- ``dynamorph_tpu.ops``      Pallas/XLA ops (VQ lookup, windows, masks, resize...)
- ``dynamorph_tpu.models``   VQ-VAE/VAE/IWAE/AAE, U-Net, ResNet-SimCLR, losses
- ``dynamorph_tpu.train``    jitted train steps, optax, early stopping, checkpoints
- ``dynamorph_tpu.track``    instance clustering, LAP tracking, trajectory relations
- ``dynamorph_tpu.reduce``   PCA (XLA), UMAP (host)
- ``dynamorph_tpu.pipeline`` stage orchestration (preprocess -> ... -> latents)
- ``dynamorph_tpu.cli``      command-line entry points
"""

__version__ = "0.1.0"
