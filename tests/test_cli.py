"""End-to-end CLI smoke tests: drive train.py / generate.py main() through
argparse + config merge + trainer, the path no unit test covers (the round-1
silent config fallback bug class lived exactly here).
"""

import json
import os
import sys

import pytest


sys.path.insert(0, __file__.rsplit("/", 2)[0])

import train as train_cli
import generate as generate_cli


TINY_CONFIG = {
    "dataset": "fakedata",
    "diffusion": {
        "timesteps": 8,
        "beta_start": 0.0001,
        "beta_end": 0.02,
        "beta_schedule": "linear",
        "model_mean_type": "eps",
        "model_var_type": "fixed-large",
        "loss_type": "mse",
    },
    "model": {
        "in_channels": 3,
        "hid_channels": 32,  # GroupNorm(32 groups) needs >=32 channels, as in the reference
        "ch_multipliers": [1, 2],
        "num_res_blocks": 1,
        "apply_attn": [False, True],
        "drop_rate": 0.1,
    },
    "train": {
        "lr": 1e-3,
        "batch_size": 64,
        "grad_norm": 1.0,
        "epochs": 1,
        "warmup": 10,
        "use_ema": True,
        "ema_decay": 0.99,
    },
}


@pytest.fixture(scope="module")
def tiny_config_path(tmp_path_factory):
    path = tmp_path_factory.mktemp("cfg") / "tiny.json"
    path.write_text(json.dumps(TINY_CONFIG))
    return str(path)


def run_main(cli, argv):
    old = sys.argv
    sys.argv = [old[0], *argv]
    try:
        cli.main()
    finally:
        sys.argv = old


def test_train_dry_run(tiny_config_path, tmp_path, capsys):
    run_main(
        train_cli,
        [
            "--config-path", tiny_config_path,
            "--dry-run",
            "--num-samples", "8",
            "--chkpt-dir", str(tmp_path / "c"),
            "--image-dir", str(tmp_path / "i"),
        ],
    )
    out = capsys.readouterr().out
    assert "dry run: stopping after first optimizer update" in out
    # hyperparameter archive written (reference train.py:156-171)
    exp_dir = tmp_path / "c" / "ddpm_fakedata"
    infos = [f for f in os.listdir(exp_dir) if f.endswith(".info")]
    assert infos, "exp_<ts>.info archive missing"
    hps = json.loads((exp_dir / infos[0]).read_text())
    assert hps["train"]["lr"] == 1e-3  # config won over the CLI default


def test_train_generate_learned_variance_roundtrip(tmp_path, capsys):
    """--model-var-type learned end to end: train.py builds the 2C-channel
    head (reference train.py:63 doubles out_channels; round-4 fix — it was
    silently C before), checkpoints it, and generate.py rebuilds the SAME
    2C head to sample from the checkpoint (the reference's generate.py:61
    pins out_channels=in_channels and cannot reload learned-var models —
    deliberate divergence)."""
    cfg = json.loads(json.dumps(TINY_CONFIG))
    cfg["diffusion"]["model_var_type"] = "learned"
    cfg["diffusion"]["loss_type"] = "kl"
    cfg_path = tmp_path / "learned.json"
    cfg_path.write_text(json.dumps(cfg))
    chkpt_dir = str(tmp_path / "c")
    run_main(
        train_cli,
        [
            "--config-path", str(cfg_path),
            "--num-samples", "8",
            "--chkpt-intv", "1",
            "--image-intv", "100",
            "--chkpt-dir", chkpt_dir,
            "--image-dir", str(tmp_path / "i"),
        ],
    )
    out = capsys.readouterr().out
    assert "epoch 1/1" in out and "nan" not in out
    run_main(
        generate_cli,
        [
            "--config-path", str(cfg_path),
            "--chkpt-path", os.path.join(chkpt_dir, "ddpm_fakedata", "1"),
            "--total-size", "8",
            "--batch-size", "8",
            "--use-ema",
            "--save-dir", str(tmp_path / "g"),
        ],
    )
    assert "wrote 8 PNGs" in capsys.readouterr().out

    # DDIM from the same learned checkpoint: eta=0 force-converts the
    # sampler to fixed-small; p_mean_var slices the 2C head's eps half
    # shape-wise (diffusion/gaussian.py)
    run_main(
        generate_cli,
        [
            "--config-path", str(cfg_path),
            "--chkpt-path", os.path.join(chkpt_dir, "ddpm_fakedata", "1"),
            "--total-size", "8",
            "--batch-size", "8",
            "--use-ema", "--use-ddim", "--subseq-size", "4",
            "--save-dir", str(tmp_path / "g2"),
        ],
    )
    assert "wrote 8 PNGs" in capsys.readouterr().out


def test_train_learned_with_ddim_eval_sampler_dry_run(tmp_path, capsys):
    """train.py --use-ddim on a learned-variance config: the in-loop
    sampler (grids + eval) is a fixed-small DDIM fed by the 2C head via
    p_mean_var's eps-half slice; the dry run exercises construction."""
    cfg = json.loads(json.dumps(TINY_CONFIG))
    cfg["diffusion"]["model_var_type"] = "learned"
    cfg["diffusion"]["loss_type"] = "kl"
    cfg_path = tmp_path / "learned.json"
    cfg_path.write_text(json.dumps(cfg))
    run_main(
        train_cli,
        [
            "--config-path", str(cfg_path),
            "--use-ddim", "--subseq-size", "4",
            "--num-samples", "8",
            "--dry-run",
            "--chkpt-dir", str(tmp_path / "c"),
            "--image-dir", str(tmp_path / "i"),
        ],
    )
    out = capsys.readouterr().out
    assert "dry run: stopping after first optimizer update" in out


def test_train_then_generate_roundtrip(tiny_config_path, tmp_path, capsys):
    chkpt_dir = str(tmp_path / "c")
    run_main(
        train_cli,
        [
            "--config-path", tiny_config_path,
            "--num-samples", "8",
            "--image-intv", "1",
            "--chkpt-intv", "1",
            "--chkpt-dir", chkpt_dir,
            "--image-dir", str(tmp_path / "i"),
        ],
    )
    out = capsys.readouterr().out
    assert "epoch 1/1" in out
    assert "checkpoint saved @ epoch 1" in out

    run_main(
        generate_cli,
        [
            "--config-path", tiny_config_path,
            "--chkpt-path", os.path.join(chkpt_dir, "ddpm_fakedata", "1"),
            "--total-size", "12",
            "--batch-size", "8",
            "--use-ema",
            "--save-dir", str(tmp_path / "g"),
        ],
    )
    out = capsys.readouterr().out
    assert "wrote 12 PNGs" in out
    pngs = [f for f in os.listdir(tmp_path / "g" / "fakedata") if f.endswith(".png")]
    assert len(pngs) == 12

    # --total-size 0 exits cleanly (regression: the pipelined writer used to
    # drain a never-assigned batch and crash with a TypeError)
    run_main(
        generate_cli,
        [
            "--config-path", tiny_config_path,
            "--chkpt-path", os.path.join(chkpt_dir, "ddpm_fakedata", "1"),
            "--total-size", "0",
            "--batch-size", "8",
            "--save-dir", str(tmp_path / "g0"),
        ],
    )
    assert "wrote 0 PNGs" in capsys.readouterr().out


def test_train_unknown_dataset_fails_loudly():
    with pytest.raises(SystemExit, match="no config found"):
        run_main(train_cli, ["--dataset", "nosuchdata"])


def test_generate_missing_checkpoint_fails_fast(tmp_path, tiny_config_path):
    with pytest.raises(SystemExit, match="no checkpoint found"):
        run_main(
            generate_cli,
            [
                "--config-path", tiny_config_path,
                "--chkpt-dir", str(tmp_path / "nope"),
                "--total-size", "4",
            ],
        )


import eval as eval_cli  # noqa: E402
import numpy as np  # noqa: E402


def test_eval_cli_end_to_end_with_injected_extractor(tmp_path, monkeypatch, capsys):
    """Drive eval.py main(): folder iteration, dataset-stats fallback path,
    FID + PR computation, manifold caching, metrics.txt append — with a
    deterministic fake feature extractor standing in for InceptionV3
    (the real weights need a download; no-egress environment)."""
    from PIL import Image

    sample_dir = tmp_path / "samples"
    sample_dir.mkdir()
    rng = np.random.RandomState(7)
    for i in range(40):
        Image.fromarray(rng.randint(0, 255, (32, 32, 3), np.uint8)).save(
            sample_dir / f"{i:04d}.png"
        )

    proj = np.random.RandomState(0).randn(32 * 32 * 3, 16).astype(np.float32)

    def fake_extractor(x):
        x = np.asarray(x, np.float32)
        return x.reshape(len(x), -1) @ proj

    import ddpm_tpu.metrics as metrics_mod

    monkeypatch.setattr(metrics_mod, "load_inception_variables", lambda p=None: {})
    monkeypatch.setattr(
        metrics_mod, "make_feature_extractor", lambda variables, **kw: fake_extractor
    )
    monkeypatch.setattr(metrics_mod, "VGG_WEIGHTS", str(tmp_path / "absent.npz"))
    monkeypatch.chdir(tmp_path)

    run_main(
        eval_cli,
        [
            "--dataset", "fakedata",
            "--sample-folder", str(sample_dir),
            "--batch-size", "32",
            "--eval-total-size", "64",
            "--precomputed-dir", str(tmp_path / "precomputed"),
            "--row-batch-size", "64",
            "--col-batch-size", "64",
        ],
    )
    out = capsys.readouterr().out
    assert "fid:" in out and "precision:" in out
    # dataset stats and the true-data PR manifold were cached for reuse;
    # the manifold cache key encodes embedding + nhood size + total size
    # (the reference reuses a stale manifold across --nhood-size values,
    # reference eval.py:114-122 — we key on it instead)
    manifold_k3 = tmp_path / "precomputed" / "pr_manifold_fakedata_inception_k3_n64.npz"
    assert (tmp_path / "precomputed" / "fid_stats_fakedata.npz").exists()
    assert manifold_k3.exists()
    text = (tmp_path / "metrics.txt").read_text()
    assert "fid" in text and "precision" in text
    # PR provenance: with the VGG weights absent the fallback ran on
    # Inception features, and the recorded results must say so — a bare
    # precision/recall number is meaningless without its feature space
    assert "pr_embedding" in text and "inception" in text
    assert "embedding: inception" in out

    # second run consumes both caches (get_precomputed + manifold load)
    k3_mtime = manifold_k3.stat().st_mtime_ns
    run_main(
        eval_cli,
        [
            "--dataset", "fakedata",
            "--sample-folder", str(sample_dir),
            "--batch-size", "32",
            "--eval-total-size", "64",
            "--precomputed-dir", str(tmp_path / "precomputed"),
            "--row-batch-size", "64",
            "--col-batch-size", "64",
        ],
    )
    assert "fid:" in capsys.readouterr().out
    assert manifold_k3.stat().st_mtime_ns == k3_mtime  # cache reused, not rebuilt

    # a different --nhood-size must NOT reuse the k=3 manifold: kth-neighbor
    # radii are k-dependent, so a fresh cache entry is built
    run_main(
        eval_cli,
        [
            "--dataset", "fakedata",
            "--sample-folder", str(sample_dir),
            "--batch-size", "32",
            "--eval-total-size", "64",
            "--metrics", "pr",
            "--nhood-size", "5",
            "--precomputed-dir", str(tmp_path / "precomputed"),
            "--row-batch-size", "64",
            "--col-batch-size", "64",
        ],
    )
    assert "precision:" in capsys.readouterr().out
    assert (tmp_path / "precomputed" / "pr_manifold_fakedata_inception_k5_n64.npz").exists()
    assert manifold_k3.stat().st_mtime_ns == k3_mtime  # k=3 entry untouched


def test_train_hybrid_loss_one_epoch(tmp_path, capsys):
    """train.py --loss-type hybrid (extension): the 2C head under the
    hybrid objective trains one epoch with finite losses and checkpoints;
    the mse+stop-grad-VLB composition is pinned at the unit level by
    test_hybrid_loss_gradient_split — here the full CLI wiring (config
    merge, out_channels doubling, fused step jit) is the subject."""
    cfg = json.loads(json.dumps(TINY_CONFIG))
    cfg["diffusion"]["model_var_type"] = "learned"
    cfg["diffusion"]["loss_type"] = "hybrid"
    cfg_path = tmp_path / "hybrid.json"
    cfg_path.write_text(json.dumps(cfg))
    run_main(
        train_cli,
        [
            "--config-path", str(cfg_path),
            "--num-samples", "8",
            "--chkpt-intv", "1",
            "--image-intv", "100",
            "--chkpt-dir", str(tmp_path / "c"),
            "--image-dir", str(tmp_path / "i"),
        ],
    )
    out = capsys.readouterr().out
    assert "loss_type:hybrid" in out
    assert "epoch 1/1" in out and "nan" not in out
