"""Test configuration: force an 8-virtual-device CPU platform BEFORE jax
initializes, so sharding/data-parallel tests run without TPU hardware
(SURVEY.md §4)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

# The deployment image's axon TPU plugin force-sets jax_platforms="axon,cpu"
# from sitecustomize, overriding the env var — override it back so tests run
# on the 8-virtual-device CPU platform, not through the TPU tunnel.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
assert len(jax.devices()) == 8, (
    f"expected 8 virtual CPU devices, got {jax.devices()}"
)

import numpy as np  # noqa: E402
import pytest  # noqa: E402
from PIL import Image  # noqa: E402


@pytest.fixture(scope="session")
def oscd_tree(tmp_path_factory):
    """A tiny synthetic on-disk OSCD tree: 5 cities (4 train-listed cities +
    1 val city) with deterministic random PNGs of varying native sizes, plus
    a synthetic corpus for 2 cities."""
    rng = np.random.RandomState(0)
    root = tmp_path_factory.mktemp("oscd")
    subdir = "Onera Satellite Change Detection Dataset"
    img_base = root / subdir / "images" / (
        "Onera Satellite Change Detection dataset - Images"
    )
    lbl_base = root / subdir / "train_labels" / (
        "Onera Satellite Change Detection dataset - Train Labels"
    )
    cities = {
        "abudhabi": (40, 52),
        "beirut": (36, 36),
        "paris": (48, 40),
        "nantes": (44, 44),
        "pisa": (38, 46),  # val city
    }
    for city, (h, w) in cities.items():
        pair = img_base / city / "pair"
        pair.mkdir(parents=True)
        for name in ("img1.png", "img2.png"):
            arr = rng.randint(0, 256, (h, w, 3), dtype=np.uint8)
            Image.fromarray(arr).save(pair / name)
        cm = lbl_base / city / "cm"
        cm.mkdir(parents=True)
        lbl = (rng.rand(h, w) > 0.8).astype(np.uint8) * 255
        Image.fromarray(lbl, mode="L").save(cm / "cm.png")
    # Synthetic corpus for two train cities.
    for city in ("abudhabi", "paris"):
        simg = root / "synthetic_data" / "images" / city
        slbl = root / "synthetic_data" / "labels" / city
        simg.mkdir(parents=True)
        slbl.mkdir(parents=True)
        for i in range(2):
            for name in (f"img1_synth_{i}.png", f"img2_synth_{i}.png"):
                arr = rng.randint(0, 256, (32, 32, 3), dtype=np.uint8)
                Image.fromarray(arr).save(simg / name)
            lbl = (rng.rand(32, 32) > 0.8).astype(np.uint8) * 255
            Image.fromarray(lbl, mode="L").save(slbl / f"cm_synth_{i}.png")
    return root
