from rald_tpu.models.registry import get_ae_model, get_generation_model, get_radar_encoder_model

__all__ = ["get_ae_model", "get_generation_model", "get_radar_encoder_model"]
