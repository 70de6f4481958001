"""Worker for the real 2-process multi-host test (tests/test_multihost.py).

Each process runs this script with (process_id, num_processes, port); they
rendezvous through jax.distributed over localhost, each exposing 2 virtual
CPU devices, and drive the production Trainer for one epoch with a
process-sharded loader — the full SURVEY §2.6 contract: strided host shard,
make_array_from_process_local_data assembly, replicated state, psum grads.
"""

import os
import sys


def main():
    process_id, num_processes, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]

    os.environ.pop("PALLAS_AXON_POOL_IPS", None)
    os.environ["JAX_PLATFORMS"] = "cpu"
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=2"
    )

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

    import jax

    jax.config.update("jax_platforms", "cpu")

    from ddpm_tpu.parallel import init_distributed

    init_distributed(
        coordinator_address=f"127.0.0.1:{port}",
        num_processes=num_processes,
        process_id=process_id,
    )
    assert jax.process_count() == num_processes, jax.process_count()
    assert jax.device_count() == 2 * num_processes, jax.device_count()
    assert jax.local_device_count() == 2

    import jax.numpy as jnp
    import numpy as np

    from ddpm_tpu.data import get_dataloader
    from ddpm_tpu.diffusion import GaussianDiffusion
    from ddpm_tpu.math import get_beta_schedule
    from ddpm_tpu.models import UNet
    from ddpm_tpu.train import TrainState, make_optimizer
    from ddpm_tpu.train.trainer import Trainer

    betas = get_beta_schedule("linear", 1e-4, 0.02, 5)
    diffusion = GaussianDiffusion.create(betas, "eps", "fixed-large", "mse")
    model = UNet(
        in_channels=3, hid_channels=32, out_channels=3,
        ch_multipliers=(1,), num_res_blocks=1, apply_attn=(False,),
    )
    x = jnp.zeros((4, 8, 8, 3), jnp.float32)
    params = model.init(jax.random.key(0), x, jnp.zeros((4,), jnp.int32))["params"]
    # host snapshot: the trainers donate their state buffers, so each run
    # needs its own fresh device copy of the initial params
    params = jax.tree.map(np.asarray, params)
    state = TrainState.create(params, make_optimizer(lr=1e-3), use_ema=False)

    # global batch 16 -> 8 rows per process (strided shard, like
    # DistributedSampler; reference datasets.py:244-263)
    loader, _ = get_dataloader(
        "fakedata", batch_size=16, split="train", resolution=8, size=64,
        random_seed=7, num_shards=num_processes, shard_index=process_id,
    )

    msgs = []
    trainer = Trainer(
        model=model, diffusion=diffusion, state=state, trainloader=loader,
        epochs=1, sample_shape=None, chkpt_intv=10**9, seed=11,
        logger=msgs.append,
    )
    trainer.train()

    # the per-epoch count is GLOBAL (len of the assembled global batch)
    assert trainer.stats.count == 64, trainer.stats.count
    loss = trainer.stats.extract()["loss"]
    assert np.isfinite(loss), loss
    # params must remain bitwise-replicated across every process: fingerprint
    # the updated tree and print it for the parent to compare
    leaves = jax.tree.leaves(jax.tree.map(np.asarray, trainer.state.params))
    fingerprint = float(sum(float(np.abs(l).sum()) for l in leaves))

    # --- device-cache mode under multi-process SPMD -------------------- #
    # same dataset/seeds through yield_indices: per-process index shards
    # assemble into the global (B,) arrays, the HBM image cache replicates
    # from each host's local copy, and the epoch must produce the exact
    # same loss as the host pixel pipeline above (identical examples,
    # flips, and t/noise streams).
    dc_loader, _ = get_dataloader(
        "fakedata", batch_size=16, split="train", resolution=8, size=64,
        random_seed=7, num_shards=num_processes, shard_index=process_id,
        yield_indices=True, device_normalize=True,
    )
    dc_state = TrainState.create(params, make_optimizer(lr=1e-3), use_ema=False)
    dc_trainer = Trainer(
        model=model, diffusion=diffusion, state=dc_state, trainloader=dc_loader,
        epochs=1, sample_shape=None, chkpt_intv=10**9, seed=11,
        logger=msgs.append,
    )
    dc_trainer.train()
    assert dc_trainer.stats.count == 64, dc_trainer.stats.count
    dc_loss = dc_trainer.stats.extract()["loss"]
    # bitwise: the device-cache gather+flip+normalize must reproduce the
    # host pipeline exactly (single-process pin: test_data.py rng parity)
    assert dc_loss == loss, (dc_loss, loss)

    # --- leader-gated in-loop Evaluator -------------------------------- #
    # every host drives the collective sampler; only the leader extracts
    # (reference ddpm_torch/metrics/__init__.py:34-47)
    from ddpm_tpu.metrics import Evaluator
    from ddpm_tpu.train.step import make_sample_fn

    total, ebatch = 8, 4
    extractor = lambda x: np.asarray(x, np.float64).reshape(len(x), -1)[:, :4]
    rng = np.random.default_rng(5)
    tgt_feats = rng.standard_normal((32, 4))
    evaluator = Evaluator(
        dataset="fakedata", total_size=total, batch_size=ebatch,
        extractor=extractor,
        target_stats=(tgt_feats.mean(0), np.cov(tgt_feats, rowvar=False)),
    )
    sampler = make_sample_fn(
        model.apply, diffusion, (ebatch, 8, 8, 3), use_ema=False,
        mesh=trainer.mesh,
    )
    from ddpm_tpu.parallel import to_numpy_global

    sample_calls = []

    def sample_fn(n, key):
        assert n == ebatch
        sample_calls.append(n)
        return to_numpy_global(sampler(dc_trainer.state, key))

    results = evaluator.eval(sample_fn)
    assert len(sample_calls) == total // ebatch, sample_calls  # all hosts sample
    if process_id == 0:
        assert evaluator.last_extracted == total, evaluator.last_extracted
        assert np.isfinite(results["fid"]), results
    else:
        assert evaluator.last_extracted == 0, evaluator.last_extracted
        assert results["fid"] is None, results

    print(
        f"MULTIHOST_OK pid={process_id} loss={loss:.6f} fp={fingerprint:.6f} "
        f"extracted={evaluator.last_extracted}"
    )


if __name__ == "__main__":
    main()
