from .toy_mlp import Decoder, TemporalLayer
from .unet import AttentionBlock, ModelWrapper, ResidualBlock, UNet, build_unet

__all__ = [
    "UNet",
    "build_unet",
    "ResidualBlock",
    "AttentionBlock",
    "ModelWrapper",
    "Decoder",
    "TemporalLayer",
]
