"""Native C++ rosbag reader (forest_slam_tpu/native) vs the Python parser."""

import numpy as np
import pytest

from forest_slam_tpu import native
from forest_slam_tpu.io.rosbag import BagReader, BagWriter


@pytest.fixture(scope="module")
def bag(tmp_path_factory):
    rng = np.random.default_rng(0)
    imgs_l = rng.integers(0, 255, (12, 48, 64, 3), dtype=np.uint8)
    imgs_r = rng.integers(0, 255, (12, 48, 64, 3), dtype=np.uint8)
    path = str(tmp_path_factory.mktemp("bags") / "stereo.bag")
    w = BagWriter(path)
    for i in range(12):
        t = 100.0 + i * 0.1
        w.write("/left/image_raw", "sensor_msgs/Image",
                BagWriter.encode_image(imgs_l[i], t, encoding="bgr8"), t)
        w.write("/right/image_raw", "sensor_msgs/Image",
                BagWriter.encode_image(imgs_r[i], t, encoding="bgr8"), t)
    w.close(compression="bz2")
    return path, imgs_l, imgs_r


def test_native_reader_builds():
    assert native.available(), "native reader should build in this image"


def test_native_matches_python_parser(bag):
    path, imgs_l, _ = bag
    out, stamps, enc = native.read_image_topic(path, "/left/image_raw")
    assert enc == "bgr8"
    assert np.array_equal(out, imgs_l)

    py_imgs, py_stamps = [], []
    for topic, msg, t in BagReader(path).read_messages(["/left/image_raw"]):
        py_imgs.append(msg.to_array())
        py_stamps.append(msg.stamp)
    assert np.array_equal(out, np.stack(py_imgs))
    assert np.allclose(stamps, py_stamps)


def test_native_stride_and_cap(bag):
    path, imgs_l, _ = bag
    out, stamps, _ = native.read_image_topic(
        path, "/left/image_raw", max_frames=4, stride=3
    )
    assert np.array_equal(out, imgs_l[::3][:4])
    assert np.allclose(stamps, (100.0 + np.arange(12) * 0.1)[::3][:4])


def test_dataset_loader_native_equals_python(bag, monkeypatch):
    from forest_slam_tpu.core.camera import PinholeCamera, StereoRig
    from forest_slam_tpu.io import dataset
    import jax.numpy as jnp

    path, _, _ = bag
    K = np.array([[50.0, 0, 32], [0, 50.0, 24], [0, 0, 1]])
    cam = PinholeCamera.create(K, None, 64, 48)
    rig = StereoRig(left=cam, right=cam, T_left_right=jnp.eye(4))

    nat = dataset.load_stereo_from_bag(
        path, rig, "/left/image_raw", "/right/image_raw", frame_stride=2
    )
    monkeypatch.setattr(native, "available", lambda: False)
    py = dataset.load_stereo_from_bag(
        path, rig, "/left/image_raw", "/right/image_raw", frame_stride=2
    )
    assert np.allclose(np.asarray(nat.images_left), np.asarray(py.images_left))
    assert np.allclose(nat.timestamps, py.timestamps)
