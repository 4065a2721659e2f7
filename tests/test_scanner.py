"""Scanner / split / directory-contract tests (reference dataset.py:240-352)."""

import os

import numpy as np
from PIL import Image

from gan_aug_pfa_tpu.config import TRAIN_CITIES, VAL_CITIES
from gan_aug_pfa_tpu.data import create_sample_lists, scan_dataset
from gan_aug_pfa_tpu.data.scanner import dataset_paths


def test_scan_real(oscd_tree):
    img_base, lbl_base, _, _ = dataset_paths(
        str(oscd_tree), "Onera Satellite Change Detection Dataset",
        "synthetic_data",
    )
    samples = scan_dataset(img_base, lbl_base, verbose=False)
    assert len(samples) == 5
    cities = {s.city for s in samples}
    assert cities == {"abudhabi", "beirut", "paris", "nantes", "pisa"}
    for s in samples:
        assert s.img1.endswith(os.path.join("pair", "img1.png"))
        assert s.label.endswith(os.path.join("cm", "cm.png"))
        assert not s.is_synthetic


def test_scan_synthetic_tagging(oscd_tree):
    _, _, simg, slbl = dataset_paths(
        str(oscd_tree), "Onera Satellite Change Detection Dataset",
        "synthetic_data",
    )
    samples = scan_dataset(simg, slbl, is_synthetic=True, verbose=False)
    assert len(samples) == 4
    assert all(s.city.endswith("_synth") for s in samples)
    assert all(s.is_synthetic for s in samples)


def test_split_train_val(oscd_tree):
    train = create_sample_lists(
        str(oscd_tree), "Onera Satellite Change Detection Dataset",
        "synthetic_data", mode="train", verbose=False,
    )
    val = create_sample_lists(
        str(oscd_tree), "Onera Satellite Change Detection Dataset",
        "synthetic_data", mode="val", verbose=False,
    )
    assert {s.city for s in train} == {"abudhabi", "beirut", "paris", "nantes"}
    assert {s.city for s in val} == {"pisa"}
    assert all(c in TRAIN_CITIES for c in {s.city for s in train})
    assert all(c in VAL_CITIES for c in {s.city for s in val})


def test_train_with_synthetic_concat(oscd_tree):
    train = create_sample_lists(
        str(oscd_tree), "Onera Satellite Change Detection Dataset",
        "synthetic_data", mode="train", use_synthetic=True, verbose=False,
    )
    # 4 real + 4 synthetic (2 cities x 2), all synthetic cities map to
    # train cities after stripping the _synth tag.
    assert len(train) == 8
    assert sum(s.is_synthetic for s in train) == 4


def test_unreadable_file_skipped(oscd_tree, tmp_path):
    # Corrupt tree: one city with a truncated PNG.
    img_base = tmp_path / "imgs" / "badcity" / "pair"
    img_base.mkdir(parents=True)
    Image.fromarray(
        np.zeros((8, 8, 3), dtype=np.uint8)
    ).save(img_base / "img1.png")
    (img_base / "img2.png").write_bytes(b"\x89PNG\r\n\x1a\nbroken")
    samples = scan_dataset(str(tmp_path / "imgs"), None, verbose=False)
    assert samples == []


def test_missing_synth_pair_skipped(oscd_tree, tmp_path):
    simg = tmp_path / "synth" / "city"
    simg.mkdir(parents=True)
    Image.fromarray(np.zeros((8, 8, 3), dtype=np.uint8)).save(
        simg / "img1_synth_0.png"
    )  # img2 missing
    samples = scan_dataset(str(tmp_path / "synth"), None, is_synthetic=True,
                           verbose=False)
    assert samples == []


def test_mode_test_no_labels(oscd_tree):
    test = create_sample_lists(
        str(oscd_tree), "Onera Satellite Change Detection Dataset",
        "synthetic_data", mode="test", verbose=False,
    )
    assert len(test) == 5
    assert all(s.label is None for s in test)


def test_arrange_sample_corpus_roundtrip(tmp_path):
    """scripts/arrange_sample_corpus.py lays a synthetic-corpus sample out
    in the OSCD directory contract, and the scanner finds it."""
    import importlib.util
    import os
    import sys

    import numpy as np
    from PIL import Image

    spec = importlib.util.spec_from_file_location(
        "arrange", os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "scripts", "arrange_sample_corpus.py",
        )
    )
    arrange = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(arrange)

    src = tmp_path / "synth"
    rng = np.random.RandomState(0)
    for city, n in (("aguasclaras", 3), ("bercy", 7)):
        d = src / "images" / city
        d.mkdir(parents=True)
        for stem in ("img1", "img2"):
            Image.fromarray(
                rng.randint(0, 255, (32, 32, 3), dtype=np.uint8)
            ).save(d / f"{stem}_synth_{n}.png")
        (src / "labels" / city).mkdir(parents=True)
        Image.fromarray(
            (rng.rand(32, 32) > 0.5).astype(np.uint8) * 255, mode="L"
        ).save(src / "labels" / city / f"cm_synth_{n}.png")

    dest = tmp_path / "oscd"
    assert arrange.arrange(str(src), str(dest)) == 2

    from gan_aug_pfa_tpu.data.scanner import create_sample_lists

    samples = create_sample_lists(
        str(dest), arrange.SUBDIR, "synthetic_data", mode="all",
        verbose=False,
    )
    assert sorted(s.city for s in samples) == ["aguasclaras", "bercy"]
    assert all(s.label is not None for s in samples)
