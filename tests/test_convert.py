"""Exercise the torch->flax checkpoint converter against synthetic
reference-shaped state dicts for every bundled config.

The key names and shapes below are derived independently from the reference
UNet's module tree (/root/reference/ddpm_torch/models/unet.py:92-233 and
modules.py: Linear/Conv2d/GroupNorm parameter layouts), NOT from the
converter — so this catches converter drift in either direction: the
converted tree must equal UNet.init's parameter tree exactly (no missing
keys, no extras, same shapes).
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp
from flax.traverse_util import flatten_dict

from ddpm_tpu import load_config
from ddpm_tpu.models import UNet
from scripts.convert_checkpoint import extract_state_dict, torch_unet_to_flax


def _synthetic_reference_state_dict(in_ch, hid, out_ch, mults, nrb, attn):
    """Emulate `UNet(...).state_dict()` of the reference torch model."""
    sd = {}
    levels = len(mults)
    embed_dim = 4 * hid

    def conv(prefix, cin, cout, k):
        sd[f"{prefix}.weight"] = np.zeros((cout, cin, k, k), np.float32)
        sd[f"{prefix}.bias"] = np.zeros((cout,), np.float32)

    def norm(prefix, c):
        sd[f"{prefix}.weight"] = np.zeros((c,), np.float32)
        sd[f"{prefix}.bias"] = np.zeros((c,), np.float32)

    def linear(prefix, cin, cout):
        sd[f"{prefix}.weight"] = np.zeros((cout, cin), np.float32)
        sd[f"{prefix}.bias"] = np.zeros((cout,), np.float32)

    def res_block(prefix, cin, cout):
        norm(f"{prefix}.norm1", cin)
        conv(f"{prefix}.conv1", cin, cout, 3)
        linear(f"{prefix}.fc", embed_dim, cout)
        norm(f"{prefix}.norm2", cout)
        conv(f"{prefix}.conv2", cout, cout, 3)
        if cin != cout:
            conv(f"{prefix}.skip", cin, cout, 1)

    def attn_block(prefix, c):
        norm(f"{prefix}.norm", c)
        conv(f"{prefix}.project_in", c, 3 * c, 1)
        conv(f"{prefix}.project_out", c, c, 1)
        # skip is Identity (in == out): no params

    def block(prefix, cin, cout, use_attn):
        # unet.py:144-154: Sequential(Res, Attn) when attention applies
        if use_attn:
            res_block(f"{prefix}.0", cin, cout)
            attn_block(f"{prefix}.1", cout)
        else:
            res_block(prefix, cin, cout)

    linear("embed.0", hid, embed_dim)
    linear("embed.2", embed_dim, embed_dim)
    conv("in_conv", in_ch, hid, 3)

    chs = [m * hid for m in mults]
    for i in range(levels):
        prev = (chs[i - 1] if i else hid)
        curr = chs[i]
        block(f"downsamples.level_{i}.0", prev, curr, attn[i])
        for j in range(1, nrb):
            block(f"downsamples.level_{i}.{j}", curr, curr, attn[i])
        if i != levels - 1:
            # Sequential(SamePad2d, Conv2d(stride 2)) -> param index 1
            conv(f"downsamples.level_{i}.{nrb}.1", curr, curr, 3)

    mid = chs[-1]
    res_block("middle.0", mid, mid)
    attn_block("middle.1", mid)
    res_block("middle.2", mid, mid)

    for i in range(levels):
        next_c = hid if i == 0 else chs[i - 1]
        prev_c = chs[-1] if i == levels - 1 else chs[i + 1]
        curr = chs[i]
        block(f"upsamples.level_{i}.0", prev_c + curr, curr, attn[i])
        for j in range(1, nrb):
            block(f"upsamples.level_{i}.{j}", 2 * curr, curr, attn[i])
        block(f"upsamples.level_{i}.{nrb}", next_c + curr, curr, attn[i])
        if i != 0:
            # Sequential(Upsample, Conv2d) -> param index 1
            conv(f"upsamples.level_{i}.{nrb + 1}.1", curr, curr, 3)

    norm("out_conv.0", hid)
    conv("out_conv.2", hid, out_ch, 3)
    return sd


CONFIG_CASES = {
    "cifar10": None,
    "celeba": None,
    "celebahq": None,
    # the mnist CLI-default shape (no bundled config upstream either)
    "mnist": dict(
        in_channels=1, hid_channels=64, out_channels=1,
        ch_multipliers=(1, 2, 2), num_res_blocks=2,
        apply_attn=(False, True, False),
    ),
}


@pytest.mark.parametrize("name", sorted(CONFIG_CASES))
def test_converter_matches_unet_param_tree(name):
    spec = CONFIG_CASES[name]
    if spec is None:
        m = load_config(name).model
        spec = dict(
            in_channels=m.in_channels,
            hid_channels=m.hid_channels,
            out_channels=m.get("out_channels", m.in_channels),
            ch_multipliers=tuple(m.ch_multipliers),
            num_res_blocks=m.num_res_blocks,
            apply_attn=tuple(m.apply_attn),
        )

    sd = _synthetic_reference_state_dict(
        spec["in_channels"], spec["hid_channels"], spec["out_channels"],
        spec["ch_multipliers"], spec["num_res_blocks"], spec["apply_attn"],
    )
    flat = torch_unet_to_flax(
        sd, spec["ch_multipliers"], spec["num_res_blocks"], list(spec["apply_attn"])
    )

    model = UNet(**spec)
    res = 2 ** len(spec["ch_multipliers"])  # divisible by 2^(levels-1)
    x = jnp.zeros((1, res, res, spec["in_channels"]), jnp.float32)
    t = jnp.zeros((1,), jnp.int32)
    tree = jax.eval_shape(lambda: model.init(jax.random.key(0), x, t))["params"]
    expect = {
        "/".join(k): v.shape for k, v in flatten_dict(tree).items()
    }

    got = {k: v.shape for k, v in flat.items()}
    missing = sorted(set(expect) - set(got))
    extra = sorted(set(got) - set(expect))
    assert not missing, f"converter missing params: {missing[:10]}"
    assert not extra, f"converter produced unknown params: {extra[:10]}"
    mismatched = {k: (got[k], expect[k]) for k in expect if got[k] != expect[k]}
    assert not mismatched, f"shape mismatches: {mismatched}"


def test_extract_state_dict_fallbacks():
    """EMA shadow / model / raw fallback order with DDP prefix stripping
    (reference generate.py:74-93)."""
    w = np.ones((3,), np.float32)
    raw = {"ema": {"shadow": {"module.in_conv.weight": w}}, "model": {"in_conv.weight": 2 * w}}
    ema = extract_state_dict(raw, use_ema=True)
    assert list(ema) == ["in_conv.weight"] and ema["in_conv.weight"][0] == 1
    model = extract_state_dict(raw, use_ema=False)
    assert model["in_conv.weight"][0] == 2
    bare = extract_state_dict({"in_conv.weight": w}, use_ema=False)
    assert list(bare) == ["in_conv.weight"]
