from .step import make_vae_step_fns, clip_gradients
from .loop import train_model, model_checkpoint
from .checkpoint import save_pytree, load_pytree, save_weights, load_weights

__all__ = [
    "make_vae_step_fns", "clip_gradients",
    "train_model", "model_checkpoint",
    "save_pytree", "load_pytree", "save_weights", "load_weights",
]
