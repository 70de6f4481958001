"""Bundled dataset configs must match the reference's exact values
(/root/reference/configs/{cifar10,celeba,celebahq}.json) and must be the
values the CLIs actually build from — round 1 shipped none, so named
datasets silently trained a CIFAR-shaped architecture.
"""

import pytest

from ddpm_tpu import load_config, resolve_config
from ddpm_tpu.models import build_unet
from ddpm_tpu.utils.config import bundled_configs


def test_bundled_config_names():
    # the three reference configs plus blobs64/blobs256 (the offline
    # disk-pipeline convergence workloads) and blobs_learned/blobs_hybrid
    # (the learned-variance kl-vs-hybrid A/B; no reference counterpart)
    assert bundled_configs() == [
        "blobs256", "blobs64", "blobs_hybrid", "blobs_learned",
        "celeba", "celebahq", "cifar10",
    ]


def test_blobs64_config_matches_celeba_architecture():
    """blobs64 is the disk-pipeline convergence workload: the CelebA MODEL
    and diffusion sections exactly (attn at level 2, fixed-small — the
    architecture VERDICT r3 asked to drive through the FileDataset path),
    with its own training budget (lr 2e-4: Blobs converges ~10x faster than
    faces, so celeba's 2e-5 would waste the schedule)."""
    cfg = load_config("blobs64")
    ref = load_config("celeba")
    assert cfg.dataset == "blobs64"
    assert cfg.model == ref.model
    assert cfg.diffusion == ref.diffusion
    assert cfg.train.lr == 2e-4
    assert cfg.train.use_ema is True


def test_blobs256_config_matches_celebahq_architecture():
    """blobs256 drives the reference's largest flagship SHAPE
    (configs/celebahq.json: 256^2, 6 levels (1,1,2,2,4,4), attn level 4,
    batch 64) through the HQ disk pipeline on a learnable distribution,
    at the reference's HQ learning rate. The lr matters: the round-5 run
    carrying the 64-res workloads' 2e-4 diverged at epoch 28 (~1.75e-4 on
    the warmup ramp) — output collapse to eps=0, loss pinned at 1.0 — the
    known 256^2 instability the reference's 2e-5 exists to avoid
    (docs/performance.md round 5)."""
    cfg = load_config("blobs256")
    ref = load_config("celebahq")
    assert cfg.dataset == "blobs256"
    assert cfg.model == ref.model
    assert cfg.diffusion == ref.diffusion
    assert cfg.train.batch_size == 64  # the HQ global batch
    assert cfg.train.lr == 2e-5  # the reference's HQ lr (celebahq.json)
    assert cfg.train.use_ema is True


def test_blobs_learned_config():
    """blobs_learned drives the learned-variance + kl (VLB) loss workload
    to convergence on the CIFAR arch: the 2C head is implied by
    model_var_type=learned (train.py doubles out_channels), so the model
    section matches cifar10 exactly."""
    cfg = load_config("blobs_learned")
    ref = load_config("cifar10")
    assert cfg.dataset == "blobs"
    assert cfg.model == ref.model
    assert cfg.diffusion.model_var_type == "learned"
    assert cfg.diffusion.loss_type == "kl"
    assert cfg.train.use_ema is True


def test_cifar10_config_values():
    cfg = load_config("cifar10")
    assert cfg.dataset == "cifar10"
    assert cfg.diffusion.model_var_type == "fixed-large"
    assert cfg.diffusion.timesteps == 1000
    assert cfg.model.ch_multipliers == [1, 2, 2, 2]
    assert cfg.model.apply_attn == [False, True, False, False]
    assert cfg.model.drop_rate == 0.1
    assert cfg.train.lr == 2e-4
    assert cfg.train.batch_size == 128
    assert cfg.train.epochs == 2040
    assert cfg.train.warmup == 5000
    assert cfg.train.use_ema is True
    assert cfg.train.ema_decay == 0.9999


def test_celeba_config_values():
    cfg = load_config("celeba")
    assert cfg.dataset == "celeba"
    assert cfg.diffusion.model_var_type == "fixed-small"
    assert cfg.model.apply_attn == [False, False, True, False]
    assert cfg.model.drop_rate == 0.0
    assert cfg.train.lr == 2e-5
    assert cfg.train.epochs == 600


def test_celebahq_config_builds_six_level_model():
    # /root/reference/configs/celebahq.json:1-27
    cfg = load_config("celebahq")
    assert cfg.dataset == "celeba_hq"
    assert cfg.diffusion.model_var_type == "fixed-small"
    assert cfg.model.ch_multipliers == [1, 1, 2, 2, 4, 4]
    assert cfg.model.apply_attn == [False, False, False, False, True, False]
    assert cfg.model.block_size == 1
    assert cfg.train.batch_size == 64
    assert cfg.train.epochs == 1200

    model = build_unet(cfg.model, channels=3)
    assert model.ch_multipliers == (1, 1, 2, 2, 4, 4)
    assert model.num_res_blocks == 2
    assert model.apply_attn == (False, False, False, False, True, False)
    assert model.hid_channels == 128


def test_registry_name_resolves_reference_filename():
    # registry key 'celeba_hq' must find the reference-named celebahq.json
    assert load_config("celeba_hq").dataset == "celeba_hq"


def test_resolve_config_fails_loudly_for_unknown_named_dataset():
    with pytest.raises(SystemExit, match="no config found"):
        resolve_config("lsun")


def test_resolve_config_fails_loudly_for_bad_explicit_path():
    with pytest.raises(SystemExit, match="no config found"):
        resolve_config("cifar10", config_path="/nonexistent/cfg.json")


def test_resolve_config_allows_configless_datasets_with_warning():
    msgs = []
    cfg = resolve_config("fakedata", logger=msgs.append)
    assert cfg is None
    assert any("no bundled config" in m for m in msgs)


def test_resolve_config_returns_bundled():
    cfg = resolve_config("celebahq")
    assert cfg.model.ch_multipliers == [1, 1, 2, 2, 4, 4]


def test_resolve_config_dir_applies_underscore_alias(tmp_path):
    # a user --config-dir laid out like the reference's (celebahq.json,
    # no underscore) must resolve for the registry name 'celeba_hq'
    import json

    (tmp_path / "celebahq.json").write_text(
        json.dumps({"model": {"ch_multipliers": [1, 1, 2, 2, 4, 4]}})
    )
    cfg = resolve_config("celeba_hq", config_dir=str(tmp_path))
    assert cfg.model.ch_multipliers == [1, 1, 2, 2, 4, 4]
