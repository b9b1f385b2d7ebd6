"""Data layer: mask construction, dataset scanning, split, loader, crop tool."""

import json
import os
import xml.etree.ElementTree as ET

import numpy as np
import pytest

from diffusionmodel_tpu.data import (
    BatchLoader,
    CrackDataset,
    build_attn_mask,
    stratified_split,
)
from diffusionmodel_tpu.data.crop_tool import (
    DatasetCropper,
    crop_and_resize,
    parse_datasetninja_dir,
    parse_voc_dir,
)

PIL = pytest.importorskip("PIL")
from PIL import Image  # noqa: E402


def _write_xml(path, bbox, size=(64, 64), name="crack"):
    root = ET.Element("annotation")
    sz = ET.SubElement(root, "size")
    ET.SubElement(sz, "width").text = str(size[0])
    ET.SubElement(sz, "height").text = str(size[1])
    obj = ET.SubElement(root, "object")
    ET.SubElement(obj, "name").text = name
    bb = ET.SubElement(obj, "bndbox")
    for k, v in zip(("xmin", "ymin", "xmax", "ymax"), bbox):
        ET.SubElement(bb, k).text = str(v)
    ET.ElementTree(root).write(path)


@pytest.fixture
def fake_root(tmp_path):
    root = tmp_path / "cropped"
    for cls in ("alligator_0", "pothole_1"):
        (root / "images" / cls).mkdir(parents=True)
    (root / "annotations").mkdir()
    rng = np.random.RandomState(0)
    for cls_i, cls in enumerate(("alligator_0", "pothole_1")):
        for i in range(6):
            stem = f"{cls}_{i}"
            img = Image.fromarray(
                rng.randint(0, 255, (64, 64, 3), np.uint8))
            img.save(root / "images" / cls / f"{stem}.jpg")
            _write_xml(str(root / "annotations" / f"{stem}.xml"),
                       (10, 20, 40, 50))
    # one orphan image without XML -> must be skipped
    Image.new("RGB", (64, 64)).save(root / "images" / "alligator_0" / "orphan.jpg")
    return str(root)


def test_build_attn_mask_exact():
    m = build_attn_mask(8, bbox=(2, 2, 6, 4), orig_wh=(8, 8))
    assert m.shape == (8, 8)
    assert m[0, 0] == 0.5          # base
    assert m[4, 0] == 1.0          # lower half
    assert m[2, 2] == 3.0 and m[3, 5] == 3.0  # bbox region [2:4, 2:6]
    assert m[4, 2] == 1.0          # just below bbox
    # scaling: bbox in orig 128x128 coords -> scaled by 8/128
    m2 = build_attn_mask(8, bbox=(32, 32, 96, 64), orig_wh=(128, 128))
    assert m2[2, 2] == 3.0 and m2[3, 5] == 3.0
    assert m2[2, 1] == 0.5


def test_crack_dataset_scan_and_load(fake_root):
    ds = CrackDataset(fake_root, img_size=32)
    assert ds.classes == ["alligator_0", "pothole_1"]
    assert len(ds) == 12  # orphan skipped
    x, c, m = ds.load(0)
    assert x.shape == (32, 32, 3) and m.shape == (32, 32)
    assert x.min() >= -1.0 and x.max() <= 1.0
    assert c == 0
    assert set(np.unique(m)) <= {0.5, 1.0, 3.0}


def test_hflip_parity_q5(fake_root):
    # Q5: image flips, mask does NOT (reference behavior).
    ds = CrackDataset(fake_root, img_size=32, hflip_prob=1.0)
    x0, _, m0 = ds.load(0, augment=False)
    x1, _, m1 = ds.load(0, augment=True)
    np.testing.assert_array_equal(m0, m1)
    np.testing.assert_allclose(x1, x0[:, ::-1, :], atol=1e-6)
    # co_flip opt-in flips both
    ds2 = CrackDataset(fake_root, img_size=32, hflip_prob=1.0, co_flip_mask=True)
    _, _, m2 = ds2.load(0, augment=True)
    np.testing.assert_array_equal(m2, m0[:, ::-1])
    # config default is the FIX since round 5 (measured A/B: QUALITY.json
    # r5b75coflip vs r4a75); the faithful mode stays one flag away
    from diffusionmodel_tpu.config import preset
    assert preset("full").train.co_flip_mask is True


def test_stratified_split_deterministic():
    labels = np.array([0] * 50 + [1] * 30 + [2] * 20)
    tr1, va1 = stratified_split(labels, 0.1, seed=42)
    tr2, va2 = stratified_split(labels, 0.1, seed=42)
    np.testing.assert_array_equal(tr1, tr2)
    np.testing.assert_array_equal(va1, va2)
    assert len(va1) == 10
    # stratification: roughly proportional
    v = labels[va1]
    assert (v == 0).sum() == 5 and (v == 1).sum() == 3 and (v == 2).sum() == 2


def test_batch_loader_shapes(fake_root):
    ds = CrackDataset(fake_root, img_size=32)
    loader = BatchLoader(ds, np.arange(len(ds)), batch_size=2, accum_steps=2,
                         num_workers=2, seed=1)
    batches = list(loader)
    assert len(batches) == 3  # 12 / 4
    for b in batches:
        assert b["x"].shape == (2, 2, 32, 32, 3)
        assert b["c"].shape == (2, 2)
        assert b["mask"].shape == (2, 2, 32, 32)
    # tail padding: 5 samples, per_step 4 -> 2 batches, second padded
    loader2 = BatchLoader(ds, np.arange(5), batch_size=2, accum_steps=2,
                          num_workers=0)
    assert len(list(loader2)) == 2


def test_crop_and_resize_semantics():
    img = Image.fromarray(np.full((200, 200, 3), 255, np.uint8))
    crop, bbox = crop_and_resize(img, (90, 90, 110, 110), target_size=60,
                                 expand_ratio=5.0)
    assert crop.size == (60, 60)
    arr = np.array(crop)
    # top third blacked out (crop_pic.py:128-131)
    assert (arr[:20] == 0).all()
    assert (arr[21:] == 255).all()
    # crop window: center (100,100), side 100 -> [50,150]; scale 60/100=0.6;
    # rel bbox 40..60 -> int(40*0.6)=24, int(60*0.6)=36 (int truncation as in
    # crop_pic.py:112-115)
    assert bbox == [24, 24, 36, 36]


def test_voc_crop_pipeline(tmp_path):
    img_dir = tmp_path / "imgs"
    anno_dir = tmp_path / "annos"
    img_dir.mkdir()
    anno_dir.mkdir()
    Image.fromarray(np.full((100, 100, 3), 128, np.uint8)).save(
        img_dir / "a.jpg")
    _write_xml(str(anno_dir / "a.xml"), (40, 40, 60, 60), size=(100, 100),
               name="pothole")
    samples = parse_voc_dir(str(img_dir), str(anno_dir))
    assert len(samples) == 1 and samples[0].objects[0].name == "pothole"
    out = tmp_path / "out"
    cropper = DatasetCropper(samples, str(out), target_size=64)
    n = cropper.process_all()
    assert n == 1
    assert (out / "pothole_0" / "a_obj0_crop.jpg").exists()
    assert (out / "annotations" / "a_obj0_crop.xml").exists()
    # idempotent
    assert cropper.process_all() == 0


def test_datasetninja_parse(tmp_path):
    img_dir = tmp_path / "img"
    ann_dir = tmp_path / "ann"
    img_dir.mkdir()
    ann_dir.mkdir()
    Image.new("RGB", (64, 64)).save(img_dir / "x.jpg")
    ann = {
        "size": {"height": 64, "width": 64},
        "objects": [{
            "classTitle": "longitudinal crack",
            "points": {"exterior": [[10, 12], [30, 40]]},
        }],
    }
    with open(ann_dir / "x.jpg.json", "w") as f:
        json.dump(ann, f)
    samples = parse_datasetninja_dir(str(img_dir), str(ann_dir))
    assert len(samples) == 1
    obj = samples[0].objects[0]
    assert obj.name == "longitudinal crack"
    assert obj.bbox == (10, 12, 30, 40)


def test_real_datasetninja_if_present():
    base = "/root/reference/road-damage-detector-DatasetNinja/train"
    if not os.path.isdir(base):
        pytest.skip("reference dataset not mounted")
    samples = parse_datasetninja_dir(os.path.join(base, "img"),
                                     os.path.join(base, "ann"))
    assert len(samples) > 700  # 804 train images
    names = {o.name for s in samples[:50] for o in s.objects}
    assert names  # class titles present


def test_image_folder_dataset(tmp_path):
    from PIL import Image

    from diffusionmodel_tpu.data import ImageFolderDataset

    # class-per-subdir layout
    for cls in ("crackA", "crackB"):
        d = tmp_path / "byclass" / cls
        d.mkdir(parents=True)
        for i in range(3):
            arr = (np.random.RandomState(i).rand(20, 24, 3) * 255
                   ).astype(np.uint8)
            Image.fromarray(arr).save(d / f"img{i}.png")
    ds = ImageFolderDataset(str(tmp_path / "byclass"), img_size=16)
    assert ds.classes == ["crackA", "crackB"]
    assert len(ds) == 6 and (ds.labels == [0, 0, 0, 1, 1, 1]).all()
    x, c, m = ds.load(0)
    assert x.shape == (16, 16, 3) and m.shape == (16, 16)
    assert 0.0 <= x.min() and x.max() <= 1.0  # ToTensor [0,1] semantics
    # flat layout -> one class; normalize flag -> [-1,1]
    flat = tmp_path / "flat"
    flat.mkdir()
    Image.fromarray(np.zeros((8, 8, 3), np.uint8)).save(flat / "a.jpg")
    ds2 = ImageFolderDataset(str(flat), img_size=8, normalize=True)
    assert len(ds2.classes) == 1 and len(ds2) == 1
    x2, _, _ = ds2.load(0)
    np.testing.assert_allclose(x2, -1.0)  # black pixel -> (0-0.5)/0.5
    # grayscale channel handling
    ds3 = ImageFolderDataset(str(flat), img_size=8, channels=1)
    assert ds3.load(0)[0].shape == (8, 8, 1)
    with pytest.raises(FileNotFoundError):
        ImageFolderDataset(str(tmp_path / "empty_nonexistent"))


def test_wire_u8_roundtrip_bit_identical(fake_root):
    """The uint8 wire format + on-device decode_wire must be bit-identical
    to the host float path (same fp32 ops on the same uint8 source)."""
    import jax.numpy as jnp

    from diffusionmodel_tpu.config import DiffusionConfig
    from diffusionmodel_tpu.train import decode_wire

    ds = CrackDataset(fake_root, img_size=32)
    idx = np.arange(len(ds))
    kw = dict(batch_size=2, accum_steps=2, num_workers=0, shuffle=False,
              augment=False)
    bw = next(iter(BatchLoader(ds, idx, **kw)))
    bf = next(iter(BatchLoader(ds, idx, wire_u8=False, **kw)))
    assert bw["x"].dtype == np.uint8 and bw["mask"].dtype == np.uint8
    dc = DiffusionConfig()
    x, mask = decode_wire(jnp.asarray(bw["x"]), jnp.asarray(bw["mask"]), dc,
                          normalize=True)
    np.testing.assert_array_equal(np.asarray(x), bf["x"])
    np.testing.assert_array_equal(np.asarray(mask), bf["mask"])


def test_loader_surfaces_decode_errors(fake_root):
    """A corrupt image must raise in the consumer, not hang the epoch."""
    ds = CrackDataset(fake_root, img_size=32)
    # corrupt one image file in place
    bad = ds.samples[0][0]
    with open(bad, "wb") as f:
        f.write(b"not a jpeg")
    loader = BatchLoader(ds, np.arange(len(ds)), batch_size=2, accum_steps=2,
                         num_workers=2, shuffle=False)
    with pytest.raises(Exception):
        list(loader)
