"""save_images slice export — naming, orientation, dtype handling, and
byte-stable PNG output."""

import hashlib
import os

import numpy as np
import pytest

from cloud_volume_spark import png_io
from cloud_volume_spark.images import save_images


@pytest.fixture()
def vol():
    rng = np.random.default_rng(5)
    return rng.integers(0, 255, (12, 10, 4), dtype=np.uint8)


def test_z_slices_roundtrip_with_orientation(vol, tmp_path):
    out = save_images(vol, str(tmp_path / "s"), axis="z")
    files = sorted(os.listdir(out))
    assert files == [f"{i:05d}.png" for i in range(4)]
    for z, name in enumerate(files):
        with open(os.path.join(out, name), "rb") as f:
            img = png_io.decode(f.read())
        want = np.flipud(np.rot90(vol[:, :, z], 1))
        assert np.array_equal(img.squeeze(), want)


def test_x_axis_unrotated(vol, tmp_path):
    out = save_images(vol, str(tmp_path / "x"), axis="x")
    assert len(os.listdir(out)) == 12
    with open(os.path.join(out, "00003.png"), "rb") as f:
        img = png_io.decode(f.read())
    assert np.array_equal(img.squeeze(), vol[3, :, :])


def test_multichannel_prefix(tmp_path):
    arr = np.zeros((6, 6, 2, 3), dtype=np.uint8)
    out = save_images(arr, str(tmp_path / "c"), axis="z")
    names = sorted(os.listdir(out))
    assert names == [
        "0-00000.png", "0-00001.png", "1-00000.png", "1-00001.png",
        "2-00000.png", "2-00001.png",
    ]


def test_float_global_norm(tmp_path):
    arr = np.linspace(-1.0, 1.0, 64).reshape(4, 4, 4)
    out = save_images(arr, str(tmp_path / "f"), axis="z", global_norm=True)
    with open(os.path.join(out, "00000.png"), "rb") as f:
        img = png_io.decode(f.read())
    assert img.dtype == np.uint8
    # global normalization: the first slice holds the volume minimum
    # (0) but not the volume maximum
    assert img.min() == 0 and img.max() < 255


def test_bool_becomes_0_255(tmp_path):
    arr = np.zeros((4, 4, 1), dtype=bool)
    arr[1, 2, 0] = True
    out = save_images(arr, str(tmp_path / "b"), axis="z")
    with open(os.path.join(out, "00000.png"), "rb") as f:
        img = png_io.decode(f.read()).squeeze()
    assert set(np.unique(img)) == {0, 255}


def test_uint32_labels_export_rgba(tmp_path):
    arr = np.arange(16, dtype=np.uint32).reshape(4, 4, 1) * 100000
    out = save_images(arr, str(tmp_path / "u"), axis="z")
    with open(os.path.join(out, "00000.png"), "rb") as f:
        img = png_io.decode(f.read())
    assert img.shape[-1] == 4
    assert (img[..., 3] == 255).all()  # forced opaque alpha


def test_jpeg_format(vol, tmp_path):
    out = save_images(vol, str(tmp_path / "j"), axis="z",
                      image_format="JPEG")
    assert sorted(os.listdir(out)) == [f"{i:05d}.jpeg" for i in range(4)]


def test_png_bytes_golden_stable(tmp_path):
    """Deterministic output bytes: same input -> same file bytes, and
    the digest is pinned so codec drift is visible."""
    arr = (np.arange(64, dtype=np.uint8).reshape(8, 8, 1) * 3)
    out = save_images(arr, str(tmp_path / "g"), axis="z")
    with open(os.path.join(out, "00000.png"), "rb") as f:
        digest = hashlib.md5(f.read()).hexdigest()
    out2 = save_images(arr, str(tmp_path / "g2"), axis="z")
    with open(os.path.join(out2, "00000.png"), "rb") as f:
        digest2 = hashlib.md5(f.read()).hexdigest()
    assert digest == digest2
    assert digest == "69159413c616ab10a4e8b62041ce69b2"


def test_volume_save_images(spark, tmp_path):
    """Volume cutout -> slice export end to end."""
    from cloud_volume_spark import Bbox, Volume

    rng = np.random.default_rng(8)
    arr = rng.integers(0, 255, (16, 12, 3, 1), dtype=np.uint8)
    vol = Volume.from_numpy(
        spark, arr, str(tmp_path / "v"), chunk_size=(8, 8, 4)
    )
    out = vol.save_images(
        Bbox((0, 0, 0), (16, 12, 3)), directory=str(tmp_path / "imgs")
    )
    files = sorted(os.listdir(out))
    assert files == [f"{i:05d}.png" for i in range(3)]
    with open(os.path.join(out, "00001.png"), "rb") as f:
        img = png_io.decode(f.read())
    want = np.flipud(np.rot90(arr[:, :, 1, 0], 1))
    assert np.array_equal(img.squeeze(), want)


def test_uint16_jpeg_fixed_mapping(tmp_path):
    """uint16 JPEG export uses a fixed high-byte mapping, not
    data-dependent min-max: the same voxel value must produce the same
    pixel regardless of what else is in the slice."""
    from cloud_volume_spark import jpeg_io
    a = np.full((16, 16, 1), 0x3700, dtype=np.uint16)
    b = a.copy()
    b[0, 0, 0] = 0xFFFF  # different slice max must not rescale others
    out_a = save_images(a, str(tmp_path / "a"), axis="z", image_format="JPEG")
    out_b = save_images(b, str(tmp_path / "b"), axis="z", image_format="JPEG")
    img_a = jpeg_io.decode(open(os.path.join(out_a, "00000.jpeg"), "rb").read())
    img_b = jpeg_io.decode(open(os.path.join(out_b, "00000.jpeg"), "rb").read())
    assert abs(int(img_a[8, 8]) - 0x37) <= 4
    assert abs(int(img_b[8, 8]) - 0x37) <= 4


def test_label_jpeg_raises(tmp_path):
    arr = np.arange(16, dtype=np.uint32).reshape(4, 4, 1)
    with pytest.raises(ValueError, match="JPEG export does not support"):
        save_images(arr, str(tmp_path / "l"), axis="z", image_format="JPEG")
