from .ddim import DDIM, ddim_from_betas, ddim_from_ddpm, get_selection_schedule
from .gaussian import GaussianDiffusion, extract

__all__ = [
    "GaussianDiffusion",
    "extract",
    "DDIM",
    "ddim_from_betas",
    "ddim_from_ddpm",
    "get_selection_schedule",
]
