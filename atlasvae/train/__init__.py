from .step import make_vae_step_fns, clip_gradients
from .loop import train_model, model_checkpoint
from .checkpoint import save_pytree, load_pytree, save_weights, load_weights
from .keras_import import (load_keras_vae, load_keras_aae, load_keras_jetid,
                           read_keras_weights)

__all__ = [
    "make_vae_step_fns", "clip_gradients",
    "train_model", "model_checkpoint",
    "save_pytree", "load_pytree", "save_weights", "load_weights",
    "load_keras_vae", "load_keras_aae", "load_keras_jetid",
    "read_keras_weights",
]
