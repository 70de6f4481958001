"""ddpm_tpu — a TPU-native DDPM/DDIM framework (JAX / XLA / Pallas / pjit).

Re-designs the capabilities of tqch/ddpm-torch for TPU hardware: frozen-pytree
diffusion processes, lax.scan samplers, flax NHWC models, a single fused jitted
train step (loss + grad psum + clip + Adam + warmup + EMA), SPMD data
parallelism over a jax.sharding.Mesh, and Orbax checkpointing.

Public API mirrors the reference's package root (ddpm_torch/__init__.py:1-22).
"""

from .data import DATASET_DICT, DATASET_INFO, get_dataloader
from .diffusion import (
    DDIM,
    GaussianDiffusion,
    ddim_from_betas,
    ddim_from_ddpm,
    get_selection_schedule,
)
from .diffusion.toy import ToyGaussianDiffusion
from .math import get_beta_schedule
from .models import Decoder, ModelWrapper, UNet, build_unet
from .parallel import make_mesh, shard_batch
from .train import (
    DummyScheduler,
    TrainState,
    make_optimizer,
    make_sample_fn,
    make_train_step,
)
from .train.trainer import Trainer
from .utils import (
    ConfigDict,
    RunningStatistics,
    dict2str,
    get_param,
    load_config,
    resolve_config,
    seed_all,
)


def __getattr__(name):
    # Evaluator pulls in the whole metrics stack (inception/vgg/scipy);
    # export it lazily so plain training runs don't pay the import.
    if name == "Evaluator":
        from .metrics import Evaluator

        return Evaluator
    raise AttributeError(name)


__version__ = "0.1.0"

__all__ = [
    "get_beta_schedule",
    "GaussianDiffusion",
    "ToyGaussianDiffusion",
    "DDIM",
    "ddim_from_betas",
    "ddim_from_ddpm",
    "get_selection_schedule",
    "UNet",
    "build_unet",
    "Decoder",
    "DATASET_DICT",
    "DATASET_INFO",
    "get_dataloader",
    "Trainer",
    "Evaluator",
    "DummyScheduler",
    "ModelWrapper",
    "TrainState",
    "make_optimizer",
    "make_train_step",
    "make_sample_fn",
    "make_mesh",
    "shard_batch",
    "seed_all",
    "get_param",
    "ConfigDict",
    "dict2str",
    "load_config",
    "resolve_config",
    "RunningStatistics",
]
