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
    print(f"MULTIHOST_OK pid={process_id} loss={loss:.6f} fp={fingerprint:.6f}")


if __name__ == "__main__":
    main()
