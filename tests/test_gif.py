"""GIF assembly tests: the pure-Python encoder must produce files that a
standard decoder (PIL) reads back bit-exactly."""

import numpy as np
import pytest

from wgpu_n_body_tpu.runners.gif import write_gif

PIL = pytest.importorskip("PIL.Image")


def _decode_frames(path):
    img = PIL.open(path)
    frames = []
    for i in range(getattr(img, "n_frames", 1)):
        img.seek(i)
        frames.append(np.asarray(img.convert("L")))
    return frames


def test_gif_roundtrip_exact(tmp_path):
    rng = np.random.RandomState(0)
    frames = [rng.randint(0, 256, (37, 53)).astype(np.uint8) for _ in range(3)]
    path = str(tmp_path / "anim.gif")
    write_gif(path, frames, fps=20)
    out = _decode_frames(path)
    assert len(out) == 3
    for a, b in zip(frames, out):
        np.testing.assert_array_equal(a, b)


def test_gif_accepts_float_frames_and_single_frame(tmp_path):
    img = np.linspace(0, 1, 64 * 64, dtype=np.float32).reshape(64, 64)
    path = str(tmp_path / "one.gif")
    write_gif(path, [img])
    out = _decode_frames(path)
    assert len(out) == 1
    np.testing.assert_array_equal(
        out[0], (np.clip(img, 0, 1) * 255 + 0.5).astype(np.uint8)
    )


def test_gif_long_frame_exercises_dict_reset(tmp_path):
    # >4096 distinct LZW phrases forces the encoder's dictionary reset path
    rng = np.random.RandomState(1)
    frame = rng.randint(0, 256, (256, 256)).astype(np.uint8)
    path = str(tmp_path / "big.gif")
    write_gif(path, [frame, 255 - frame], fps=5)
    out = _decode_frames(path)
    np.testing.assert_array_equal(out[0], frame)
    np.testing.assert_array_equal(out[1], 255 - frame)


def test_gif_header_and_loop_extension(tmp_path):
    path = str(tmp_path / "hdr.gif")
    write_gif(path, [np.zeros((4, 4), np.uint8)] * 2, fps=50, loop=0)
    blob = open(path, "rb").read()
    assert blob[:6] == b"GIF89a"
    assert b"NETSCAPE2.0" in blob
    assert blob[-1:] == b"\x3b"


def test_gif_rejects_empty_and_mismatched(tmp_path):
    with pytest.raises(ValueError):
        write_gif(str(tmp_path / "x.gif"), [])
    with pytest.raises(ValueError):
        write_gif(
            str(tmp_path / "y.gif"),
            [np.zeros((4, 4), np.uint8), np.zeros((5, 4), np.uint8)],
        )
