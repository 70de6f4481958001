from .toy_mlp import Decoder, TemporalLayer
from .unet import AttentionBlock, ModelWrapper, ResidualBlock, UNet

__all__ = [
    "UNet",
    "ResidualBlock",
    "AttentionBlock",
    "ModelWrapper",
    "Decoder",
    "TemporalLayer",
]
