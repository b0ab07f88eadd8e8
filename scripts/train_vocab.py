"""Train the packaged ORB vocabulary artifact from synthetic imagery.

The reference ships a pretrained ``Vocabulary/ORBvoc.txt`` (trained on
outdoor imagery) and loads it at startup (``src/System.cc:86-96``). This
environment has no egress to fetch imagery, so the artifact is trained on
the same synthetic texture family the benchmarks exercise: random speckle/
blob scenes rendered by the in-repo splat renderer plus random-rectangle
textures — descriptors drawn from the distribution the loop closer will
actually score.

Writes ``gsorb_slam_tpu/assets/ORBvoc_synth.txt`` (DBoW2 text format,
loadable by the reference's ``TemplatedVocabulary::loadFromTextFile`` too).
"""

import os
import sys

import numpy as np

os.environ.setdefault("JAX_PLATFORMS", "cpu")
import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

from gsorb_slam_tpu.core.config import ORBConfig
from gsorb_slam_tpu.frontend.orb import extract_orb
from gsorb_slam_tpu.frontend.vocab import (
    build_vocabulary,
    load_orbvoc_text,
    save_orbvoc_text,
)


def textured(rng, h=240, w=320, n=160):
    img = np.zeros((h, w), np.float32)
    for _ in range(n):
        y, x = rng.integers(5, h - 25), rng.integers(5, w - 25)
        img[y : y + rng.integers(4, 16), x : x + rng.integers(4, 16)] = (
            rng.uniform(0.25, 1.0)
        )
    return img


def speckle(rng, h=240, w=320):
    from scipy.ndimage import gaussian_filter

    img = rng.uniform(0, 1, (h, w)).astype(np.float32)
    img = gaussian_filter(img, rng.uniform(1.0, 2.5))
    img = (img - img.min()) / (np.ptp(img) + 1e-9)
    return (img > rng.uniform(0.4, 0.6)).astype(np.float32) * rng.uniform(0.5, 1.0)


def main() -> int:
    rng = np.random.default_rng(7)
    cfg = ORBConfig(n_features=500, n_levels=4)
    extract = jax.jit(lambda g: extract_orb(g, cfg))
    descs = []
    for i in range(40):
        img = textured(rng) if i % 2 == 0 else speckle(rng)
        f = extract(jnp.asarray(img))
        v = np.asarray(f.valid)
        descs.append(np.asarray(f.descriptors)[v])
        print(f"image {i}: {v.sum()} descriptors", flush=True)
    D = np.concatenate(descs)
    print(f"training on {len(D)} descriptors", flush=True)
    voc = build_vocabulary(D, k=9, L=3, seed=0, iters=6)
    print(f"vocabulary: {voc.n_words} words", flush=True)

    out = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "..",
        "gsorb_slam_tpu", "assets", "ORBvoc_synth.txt",
    )
    save_orbvoc_text(voc, out)
    # round-trip check
    voc2 = load_orbvoc_text(out)
    assert voc2.n_words == voc.n_words, (voc2.n_words, voc.n_words)
    print(f"wrote {out} ({os.path.getsize(out)} bytes)", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
