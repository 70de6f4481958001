from .toy_mlp import Decoder, TemporalLayer
from .unet import AttentionBlock, ResidualBlock, UNet

__all__ = ["UNet", "ResidualBlock", "AttentionBlock", "Decoder", "TemporalLayer"]
