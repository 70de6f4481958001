"""Trainer: the epoch-loop orchestrator.

Covers the responsibilities of the reference Trainer
(ddpm_torch/utils/train.py:61-234) with a TPU-native execution model:

  * the per-step work (input draw, loss, grads + ICI psum, clip, Adam, LR
    warmup, EMA) is ONE jitted `train_step` (train/step.py) instead of seven
    host-orchestrated torch calls — there is no DDP wrapper, no explicit
    loss reduce, and no barrier (SPMD programs are implicitly synchronized);
  * sampling for image grids runs the lax.scan sampler under the EMA weights,
    batch axis sharded over the mesh (replaces the all_gather assembly,
    utils/train.py:183-187);
  * checkpoints are Orbax pytrees with epoch-keyed directories
    (train/checkpoint.py), resume included;
  * `dry_run` stops after the first optimizer update (train.py:282 semantics).

Host-device overlap: batches are staged with `jax.device_put` onto the mesh
while the previous step is still executing (dispatch is async), so input feed
overlaps compute without a DataLoader worker pool.
"""

from __future__ import annotations

import os
import time
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..parallel.mesh import (
    batch_sharding,
    make_mesh,
    replicated_sharding,
    stage_global_batch,
    stage_replicated,
    to_numpy_global,
)
from ..utils import RunningStatistics
from ..utils.images import save_image_grid
from .checkpoint import load_checkpoint, save_checkpoint
from .state import TrainState
from .step import make_sample_fn, make_train_step

__all__ = ["Trainer"]


class Trainer:
    def __init__(
        self,
        model,
        diffusion,
        state: TrainState,
        trainloader,
        epochs: int,
        sampler_diffusion=None,
        mesh=None,
        sample_size: int = 64,
        sample_shape=None,
        image_intv: int = 1,
        chkpt_intv: int = 5,
        log_intv: int = 100,
        seed: int = 8191,
        dry_run: bool = False,
        use_ema_for_sampling: bool = True,
        logger: Callable[[str], None] = print,
    ):
        self.model = model
        self.diffusion = diffusion
        # sampling (grids + in-loop eval) may use a different process than
        # training — e.g. a 50-step DDIM while training on the 1000-step DDPM
        # (reference train.py:175-213)
        self.sampler_diffusion = sampler_diffusion if sampler_diffusion is not None else diffusion
        self.state = state
        self.trainloader = trainloader
        self.epochs = epochs
        self.mesh = mesh if mesh is not None else make_mesh()
        self.sample_size = sample_size
        self.sample_shape = sample_shape
        self.image_intv = image_intv
        self.chkpt_intv = chkpt_intv
        self.log_intv = log_intv
        self.dry_run = dry_run
        self.logger = logger
        self.start_epoch = 0
        self.key = jax.random.key(seed)

        has_dropout = getattr(model, "drop_rate", 0.0) > 0.0
        self._batch_sharding = batch_sharding(self.mesh)
        self._state_sharding = replicated_sharding(self.mesh)
        self.state = jax.device_put(self.state, self._state_sharding)
        self._device_cache = bool(getattr(trainloader, "yield_indices", False))
        if self._device_cache:
            # HBM-resident dataset: the step gathers/flips/normalizes from
            # the staged images INSIDE its own program — per-step
            # host->device traffic is ~1 KB of indices (see step.py
            # from_indices and the ShardedLoader docstring). Multi-process
            # SPMD works too: in-memory datasets are constructed whole on
            # every host, so the image cache replicates from each process's
            # local copy, and the per-process index shards assemble into the
            # global (B,) arrays exactly like pixel batches do (reference
            # DistributedSampler contract, datasets.py:244-266).
            images = trainloader.dataset.images
            # flat [N, H*W*C] rows: gathering the NHWC layout costs ~4 ms vs
            # 0.43 ms flat (minor-dim-3 defeats the gather emitter)
            self._dev_images = stage_replicated(
                np.ascontiguousarray(images).reshape(len(images), -1), self.mesh
            )
            idx_step = make_train_step(
                model.apply, diffusion, has_dropout=has_dropout,
                mesh=self.mesh, from_indices=True, image_shape=images.shape[1:],
            )
            self.train_step = lambda state, b, key: idx_step(
                state, self._dev_images, b[0], b[1], key
            )
        else:
            self.train_step = make_train_step(
                model.apply, diffusion, has_dropout=has_dropout, mesh=self.mesh
            )
        self.use_ema_for_sampling = use_ema_for_sampling
        self._eval_samplers = {}
        self.sample_fn = None
        if sample_shape is not None:
            self.sample_fn = make_sample_fn(
                model.apply,
                self.sampler_diffusion,
                (sample_size, *sample_shape),
                use_ema=use_ema_for_sampling,
                mesh=self.mesh,
            )

        self.stats = RunningStatistics(loss=None)

    # ------------------------------------------------------------------ #

    @property
    def is_leader(self) -> bool:
        return jax.process_index() == 0

    def sample(self, key=None):
        assert self.sample_fn is not None
        key = key if key is not None else jax.random.key(131071)
        return to_numpy_global(self.sample_fn(self.state, key))

    def load_checkpoint(self, chkpt_dir: str, epoch: Optional[int] = None):
        self.state, self.start_epoch = load_checkpoint(self.state, chkpt_dir, epoch)
        self.state = jax.device_put(self.state, self._state_sharding)
        self.logger(f"resumed from epoch {self.start_epoch} (step {int(self.state.step)})")

    def train(
        self,
        evaluator=None,
        chkpt_dir: Optional[str] = None,
        image_dir: Optional[str] = None,
    ):
        for d in (chkpt_dir, image_dir):
            if d and self.is_leader:
                os.makedirs(d, exist_ok=True)
        if evaluator is not None and chkpt_dir:
            # fail before the first epoch, not at the first checkpoint interval
            self._require_sample_shape()

        try:
            num_batches = len(self.trainloader)
        except TypeError:
            num_batches = None
        for epoch in range(self.start_epoch, self.epochs):
            self.stats.reset()
            self.trainloader.set_epoch(epoch)
            t0 = time.time()
            # async device scalars with their batch sizes; drained into the
            # count-weighted RunningStatistics without stalling the pipeline
            # (reference per-batch tqdm postfix: utils/train.py:206-212)
            pending = []
            for i, batch in enumerate(self._prefetched()):
                self.key, sub = jax.random.split(self.key)
                self.state, loss = self.train_step(self.state, batch, sub)
                # device-cache batches are (idx, flips) descriptors
                n = len(batch[0]) if isinstance(batch, tuple) else len(batch)
                pending.append((n, loss))
                if self.dry_run and int(self.state.step) >= 1:
                    self.logger("dry run: stopping after first optimizer update")
                    return
                if self.log_intv and (i + 1) % self.log_intv == 0 and len(pending) > 1:
                    # every loss but the just-dispatched one has completed by
                    # now, so fetching here costs no device stall
                    self._drain_losses(pending[:-1])
                    pending = pending[-1:]
                    running = self.stats.extract()
                    total = f"/{num_batches}" if num_batches else ""
                    self.logger(
                        f"epoch {epoch + 1}/{self.epochs} [{i + 1}{total}] "
                        f"loss={running['loss']:.4f}"
                    )
            self._drain_losses(pending)
            dt = time.time() - t0
            mean = self.stats.extract()
            n_examples = self.stats.count
            imgs_per_sec = n_examples / max(dt, 1e-9)
            self.logger(
                f"epoch {epoch + 1}/{self.epochs} loss={mean['loss']:.4f} "
                f"({imgs_per_sec:.1f} imgs/s)"
            )

            if image_dir and self.sample_fn and (epoch + 1) % self.image_intv == 0:
                self.key, sub = jax.random.split(self.key)
                x = self.sample(sub)
                if self.is_leader:
                    save_image_grid(os.path.join(image_dir, f"{epoch + 1}.png"), x)

            if chkpt_dir and (epoch + 1) % self.chkpt_intv == 0:
                extra = {"loss": mean["loss"]}
                if evaluator is not None:
                    eval_results = evaluator.eval(self.sample_fn_for_eval())
                    extra.update(eval_results)
                    self.logger(f"eval @ epoch {epoch + 1}: {eval_results}")
                if self.is_leader:
                    save_checkpoint(self.state, chkpt_dir, epoch + 1, extra)
                    self.logger(f"checkpoint saved @ epoch {epoch + 1}")

    def _drain_losses(self, pending):
        """Fold async device loss scalars into the running stats with ONE
        device fetch. On a remotely-attached chip every ``float(scalar)`` is
        a full tunnel round trip (~35 ms measured, docs/performance.md), so
        draining a 100-batch window scalar-by-scalar costs more wall time
        than the steps it reports on (measured: the 80-epoch blobs run
        sustained 2,270 imgs/s against the logging-free loop's 3,380 —
        the difference was exactly this drain). Stacking on device first
        makes the window's fetch a single transfer."""
        if not pending:
            return
        if len(pending) == 1:
            self.stats.update(pending[0][0], loss=float(pending[0][1]))
            return
        vals = np.asarray(jnp.stack([loss for _, loss in pending]))
        for (n, _), v in zip(pending, vals):
            self.stats.update(n, loss=float(v))

    def _prefetched(self):
        """Iterate the trainloader with a one-batch device lookahead.

        The host->device transfer of batch k+1 overlaps step k's execution
        (the reference gets this from DataLoader worker processes +
        pinned-memory copies; here one slot is enough because dispatch is
        already asynchronous).

        Device-cache mode (``trainloader.yield_indices``): the whole
        in-memory uint8 dataset is staged to HBM ONCE and every batch is an
        on-device gather+flip — the per-step host->device transfer is ~1 KB
        of indices instead of the pixel batch. See ShardedLoader's docstring
        for why (speed AND the axon per-transfer host-buffer leak).
        """
        it = iter(self.trainloader)
        if self._device_cache:
            # stage the ~1 KB index/flip arrays one slot ahead (async
            # device_put): letting the step transfer them at dispatch time
            # costs ~3 ms/step of un-hidden tunnel latency (measured,
            # logs/reconcile_r04.json devcache arms). The (B,) arrays are
            # batch-sharded — under multi-process SPMD each host contributes
            # its strided index shard, same assembly as pixel batches.
            pending = None
            for idx, flips in it:
                if flips is None:
                    flips = np.zeros(len(idx), np.uint8)
                staged = (
                    stage_global_batch(idx, self.mesh, sharding=self._batch_sharding),
                    stage_global_batch(flips, self.mesh, sharding=self._batch_sharding),
                )
                if pending is not None:
                    yield pending
                pending = staged
            if pending is not None:
                yield pending
            return
        pending = None
        for batch in it:
            # single-host: async device_put; multi-process SPMD: assemble the
            # global array from this process's shard (SURVEY §2.6)
            staged = stage_global_batch(batch, self.mesh, sharding=self._batch_sharding)
            if pending is not None:
                yield pending
            pending = staged
        if pending is not None:
            yield pending

    def _require_sample_shape(self):
        if self.sample_shape is None:
            raise ValueError(
                "in-loop evaluation needs samples: construct Trainer with "
                "sample_shape=(H, W, C) when passing an evaluator to train()"
            )

    def sample_fn_for_eval(self):
        """Adapter handing the in-loop evaluator a ``fn(n, key)``.

        A dedicated jitted sampler is built (and cached) per requested batch
        size, so the evaluator's batch size is independent of the image-grid
        ``sample_size`` and every call keeps static shapes.
        """
        self._require_sample_shape()

        def fn(n: int, key):
            sampler = self._eval_samplers.get(n)
            if sampler is None:
                sampler = make_sample_fn(
                    self.model.apply,
                    self.sampler_diffusion,
                    (n, *self.sample_shape),
                    use_ema=self.use_ema_for_sampling,
                    mesh=self.mesh,
                )
                self._eval_samplers[n] = sampler
            return to_numpy_global(sampler(self.state, key))

        return fn
