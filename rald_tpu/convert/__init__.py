from rald_tpu.convert.torch_ckpt import (
    convert_edm_state_dict,
    convert_radar_autoencoder_state_dict,
    convert_vae_state_dict,
    load_torch_checkpoint,
)

__all__ = [
    "convert_edm_state_dict",
    "convert_radar_autoencoder_state_dict",
    "convert_vae_state_dict",
    "load_torch_checkpoint",
]
