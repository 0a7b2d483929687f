from .steps import make_train_step, make_eval_step
from .trainer import train_vqvae, EarlyStopping
