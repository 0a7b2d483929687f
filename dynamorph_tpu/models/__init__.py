from .vqvae import VQVAEz16, VQVAEz32
from .vae import VAEModel, IWAEModel, AAEModel
from .registry import get_model_cls
