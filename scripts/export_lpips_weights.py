"""Export pretrained LPIPS(alex) weights to lpips_alex.npz for the pure-JAX
LPIPS in ``ops/lpips_jax.py`` — the analog of the reference's offline
``scripts/gen_eval_model.py`` TorchScript export (run where network egress
exists; this sandbox has none).

Usage (machine with egress):
    pip install lpips torchvision
    python scripts/export_lpips_weights.py --out gsorb_slam_tpu/assets/lpips_alex.npz
"""

from __future__ import annotations

import argparse


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="gsorb_slam_tpu/assets/lpips_alex.npz")
    args = ap.parse_args(argv)

    import lpips  # pip install lpips
    import numpy as np

    model = lpips.LPIPS(net="alex", spatial=False)
    convs = [m for m in model.net.slice1] + [m for m in model.net.slice2] \
        + [m for m in model.net.slice3] + [m for m in model.net.slice4] \
        + [m for m in model.net.slice5]
    import torch.nn as nn

    conv_layers = [m for m in convs if isinstance(m, nn.Conv2d)]
    assert len(conv_layers) == 5, len(conv_layers)
    out = {}
    for i, c in enumerate(conv_layers):
        # torch OIHW -> HWIO
        out[f"conv{i}_w"] = (
            c.weight.detach().numpy().transpose(2, 3, 1, 0).astype("float32")
        )
        out[f"conv{i}_b"] = c.bias.detach().numpy().astype("float32")
    for i, lin in enumerate(model.lins):
        out[f"lin{i}_w"] = (
            lin.model[-1].weight.detach().numpy().reshape(-1).astype("float32")
        )
    np.savez_compressed(args.out, **out)
    print(f"wrote {args.out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
