"""Renderer tests: camera projection, blend parity, trajectory rendering, CLI."""

import os

import numpy as np

from wgpu_n_body_tpu.runners.renderer import (
    Camera,
    render_frame,
    render_trajectory,
    write_ppm,
)
from wgpu_n_body_tpu.runners.trajectory import TrajectoryReader, TrajectoryWriter


def test_origin_projects_to_center():
    cam = Camera(aspect=1.0)
    img = render_frame(np.zeros((1, 3), np.float32), cam, 101, 101)
    ys, xs = np.nonzero(img)
    assert len(xs) == 1
    # eye (0,1,2) looks straight at the origin -> exact image center
    assert abs(xs[0] - 50) <= 1 and abs(ys[0] - 50) <= 1
    assert np.isclose(img[ys[0], xs[0]], 0.25)


def test_alpha_blend_closed_form():
    # k overlapping particles -> 1 - 0.75^k (order-independent blend)
    pos = np.zeros((5, 3), np.float32)
    img = render_frame(pos, Camera(), 64, 64)
    assert np.isclose(img.max(), 1 - 0.75**5)


def test_behind_camera_and_out_of_frustum_culled():
    cam = Camera(aspect=1.0)
    pos = np.array(
        [[0, 1, 3.0], [50, 0, 0], [0, 0, 0]], np.float32
    )  # behind eye; far off-axis; visible
    img = render_frame(pos, cam, 64, 64)
    assert (img > 0).sum() == 1


def test_camera_controller_moves():
    cam = Camera()
    fwd = cam.moved("forward", 0.1)
    # moving forward decreases eye->target distance
    assert np.linalg.norm(np.asarray(fwd.eye)) < np.linalg.norm(np.asarray(cam.eye))
    right = cam.moved("right", 0.1)
    # orbit keeps radius constant
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(right.eye)),
        np.linalg.norm(np.asarray(cam.eye)),
        rtol=1e-6,
    )


def test_render_trajectory_and_ppm(tmp_path):
    root = str(tmp_path / "traj")
    w = TrajectoryWriter(root)

    class FakeState:
        pos = np.random.RandomState(0).uniform(-1, 1, (100, 3)).astype(np.float32)

    w.append(FakeState, 0)
    w.append(FakeState, 1)
    out = str(tmp_path / "frames")
    paths = render_trajectory(TrajectoryReader(root), out, width=64, height=64)
    assert len(paths) == 2 and all(os.path.exists(p) for p in paths)
    ppm = str(tmp_path / "x.ppm")
    write_ppm(ppm, np.ones((4, 4)))
    with open(ppm, "rb") as f:
        assert f.read(2) == b"P6"


def test_cli_bench_naive_smoke(capsys):
    from wgpu_n_body_tpu.cli import main

    rc = main(
        ["bench", "--sim", "naive", "--sizes", "256", "--reps", "2", "--no-pallas"]
    )
    assert rc == 0
    out = capsys.readouterr().out
    assert '"bodies_per_sec"' in out


def test_cli_visualize_smoke(tmp_path, capsys):
    from wgpu_n_body_tpu.cli import main

    out_dir = str(tmp_path / "frames")
    rc = main(
        [
            "visualize", "--sim", "naive", "--no-pallas", "--n", "256",
            "--frames", "2", "--width", "32", "--height", "32", "--out", out_dir,
        ]
    )
    assert rc == 0
    assert len(os.listdir(out_dir)) == 2
