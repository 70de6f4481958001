"""Run the REFERENCE (torch) toy stack on CPU to produce a KLD baseline.

Trains the reference's own Decoder MLP with the reference's own
GaussianDiffusion / DataStreamer / Adam at the reference defaults
(reference train_toy.py:14-38: 100 epochs, batch 1000, size 100000,
lr 1e-3, T=100 linear 1e-3..0.2, eps / fixed-large / mse, no grad clip,
mid_features 128, 3 temporal layers, seed 1234).

Two deviations from the reference's train_toy.py, both measurement-side:
- The reference repo imports torchvision at package-import time
  (ddpm_torch/datasets.py:10) but this host has none; the toy stack never
  touches it, so a lazy stub serves `torchvision.*` imports.
- Evaluation uses the SAME protocol as ddpm_tpu's ToyEvaluator (true hist
  from a fresh 30k draw, 60x60 bins over [-3,3]^2, 30k generated samples,
  eps 1e-9) instead of the reference Evaluator's quirky setup (true hist
  from a single 1000-point streamer batch, 54 bins, 60k generated —
  reference train_toy.py:115-124, toy_utils.py:128-163), so the printed
  KLD(epoch) trajectory is directly comparable to train_toy.py's output.

Usage:  python scripts/ref_toy_baseline.py --dataset gaussian8 \
            [--epochs 100] [--eval-intv 5] [--image-dir logs/ref_toy/images]
"""

import argparse
import importlib.abc
import importlib.machinery
import sys
import time
import types

sys.path.insert(0, "/root/reference")


class _Any:
    """Inert attribute sink for torchvision symbols the toy path never calls."""

    def __init__(self, name="torchvision"):
        self._name = name

    def __getattr__(self, k):
        if k.startswith("__"):
            raise AttributeError(k)
        return _Any(f"{self._name}.{k}")

    def __call__(self, *a, **k):
        return _Any(f"{self._name}()")

    def __mro_entries__(self, bases):
        return (object,)


class _TVLoader(importlib.abc.Loader):
    def create_module(self, spec):
        m = types.ModuleType(spec.name)
        m.__path__ = []
        m.__version__ = "0.15.0"

        def _getattr(k, n=spec.name):
            if k.startswith("__"):
                raise AttributeError(k)
            return _Any(f"{n}.{k}")

        m.__getattr__ = _getattr
        return m

    def exec_module(self, module):
        pass


class _TVFinder(importlib.abc.MetaPathFinder):
    def find_spec(self, name, path=None, target=None):
        if name == "torchvision" or name.startswith("torchvision."):
            return importlib.machinery.ModuleSpec(name, _TVLoader(), is_package=True)
        return None


sys.meta_path.insert(0, _TVFinder())


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--dataset", default="gaussian8",
                        choices=["gaussian8", "gaussian25", "swissroll"])
    parser.add_argument("--epochs", default=100, type=int)
    parser.add_argument("--size", default=100000, type=int)
    parser.add_argument("--batch-size", default=1000, type=int)
    parser.add_argument("--eval-intv", default=5, type=int)
    parser.add_argument("--eval-size", default=30000, type=int)
    parser.add_argument("--eval-chunk", default=10000, type=int)
    parser.add_argument("--seed", default=1234, type=int)
    parser.add_argument("--image-dir", default="", type=str)
    args = parser.parse_args()

    import numpy as np
    import torch

    torch.set_num_threads(1)

    from ddpm_torch.diffusion import get_beta_schedule
    from ddpm_torch.toy import DataStreamer, Decoder, GaussianDiffusion
    from ddpm_torch.toy.toy_data import Gaussian8, Gaussian25, SwissRoll
    from ddpm_torch.utils import seed_all

    seed_all(args.seed)
    num_batches = args.size // args.batch_size
    streamer = DataStreamer(args.dataset, batch_size=args.batch_size,
                            num_batches=num_batches)
    betas = get_beta_schedule("linear", 0.001, 0.2, 100)
    diffusion = GaussianDiffusion(
        betas=torch.as_tensor(betas, dtype=torch.float64),
        model_mean_type="eps", model_var_type="fixed-large", loss_type="mse")
    model = Decoder(2, 128, 3)
    optimizer = torch.optim.Adam(model.parameters(), lr=1e-3)

    # common-protocol evaluator (matches ddpm_tpu/metrics/toy.py defaults)
    ds_cls = {"gaussian8": Gaussian8, "gaussian25": Gaussian25,
              "swissroll": SwissRoll}[args.dataset]
    true = np.asarray(ds_cls(args.eval_size, random_state=args.seed).data)

    def norm_hist(pts):
        h = np.histogram2d(pts[:, 0], pts[:, 1], bins=60,
                           range=((-3, 3), (-3, 3)))[0]
        return h / max(h.sum(), 1)

    true_hist = norm_hist(true)
    eps = 1e-9

    def evaluate():
        model.eval()
        chunks = []
        with torch.inference_mode():
            left = args.eval_size
            while left > 0:
                n = min(args.eval_chunk, left)
                chunks.append(diffusion.p_sample(
                    model, (n, 2), device=torch.device("cpu")).numpy())
                left -= n
        model.train()
        gen = np.concatenate(chunks)
        gh = norm_hist(gen)
        return float(np.sum(true_hist * (np.log(true_hist + eps)
                                         - np.log(gh + eps)))), gen

    t0 = time.time()
    for epoch in range(args.epochs):
        losses, count = 0.0, 0
        for x in streamer:
            B = x.shape[0]
            t = torch.randint(100, size=(B,), dtype=torch.int64)
            loss = diffusion.train_losses(model, x_0=x, t=t).mean()
            optimizer.zero_grad(set_to_none=True)
            loss.backward()
            optimizer.step()
            losses += float(loss) * B
            count += B
        print(f"epoch {epoch + 1}/{args.epochs} loss={losses / count:.4f}", flush=True)
        if (epoch + 1) % args.eval_intv == 0:
            kld, gen = evaluate()
            print(f"  kld={kld:.4f}", flush=True)
            if args.image_dir:
                import os

                import matplotlib

                matplotlib.use("Agg")
                import matplotlib.pyplot as plt

                os.makedirs(args.image_dir, exist_ok=True)
                fig, ax = plt.subplots(figsize=(6, 6), dpi=100)
                ax.scatter(gen[:10000, 0], gen[:10000, 1], s=2)
                ax.set_xlim(-3, 3)
                ax.set_ylim(-3, 3)
                fig.savefig(os.path.join(
                    args.image_dir, f"ref_{args.dataset}_{epoch + 1}.png"))
                plt.close(fig)
    print(f"total wall: {time.time() - t0:.1f}s", flush=True)


if __name__ == "__main__":
    main()
