"""Interactive online viewer (runners/online.py).

The reference's windowed visualizer (src/bin/visualize.rs +
src/runners/online_renderer.rs) has: a per-redraw update+render+step loop
drawing the PRE-step state, held-key camera movement at speed 0.2, pause
on focus loss, Esc to quit. These tests drive the same loop through
OnlineViewer.tick() and through a real HTTP round trip.
"""

import http.client
import json
import threading

import numpy as np
import pytest

from wgpu_n_body_tpu.inits import disc_init
from wgpu_n_body_tpu.models.naive import NaiveSim
from wgpu_n_body_tpu.params import NaiveParams, SimParams
from wgpu_n_body_tpu.runners.online import CONTROLLER_SPEED, KEYMAP, OnlineViewer
from wgpu_n_body_tpu.runners.renderer import Camera, png_bytes


def _viewer(n=64, **kw):
    sim = NaiveSim(SimParams(particle_num=n, g=1e-5, dt=0.0016),
                   NaiveParams(use_pallas=False))
    kw.setdefault("width", 64)
    kw.setdefault("height", 64)
    return OnlineViewer(sim, disc_init, **kw)


def test_png_bytes_decodable():
    img = np.linspace(0, 1, 32 * 16, dtype=np.float32).reshape(16, 32)
    data = png_bytes(img)
    assert data[:8] == b"\x89PNG\r\n\x1a\n"
    pil = pytest.importorskip("PIL.Image")
    import io

    decoded = np.asarray(pil.open(io.BytesIO(data)))
    assert decoded.shape == (16, 32)
    np.testing.assert_array_equal(
        decoded, (np.clip(img, 0, 1) * 255).astype(np.uint8)
    )


def test_tick_steps_and_renders():
    v = _viewer()
    frame = v.tick()
    assert frame[:8] == b"\x89PNG\r\n\x1a\n"
    assert v.runner.step_num == 1 and v.frames == 1
    v.tick()
    assert v.runner.step_num == 2


def test_focus_loss_pauses_stepping():
    # bin/visualize.rs:65-71 — no stepping while unfocused, still renders
    v = _viewer()
    frame = v.tick(focused=False)
    assert frame[:8] == b"\x89PNG\r\n\x1a\n"
    assert v.runner.step_num == 0 and v.frames == 1


def test_key_moves_match_camera_controller():
    # one held W tick == Camera.moved("forward", 0.2)
    v = _viewer()
    expect = Camera(aspect=1.0).moved("forward", CONTROLLER_SPEED)
    v.tick(keys="w")
    np.testing.assert_allclose(v.camera.eye, expect.eye, rtol=1e-6)
    # arrows alias WASD (online_renderer.rs:92-118)
    assert KEYMAP["arrowup"] == "forward" and KEYMAP["e"] == "down"
    v2 = _viewer()
    v2.tick(keys="arrowup")
    np.testing.assert_allclose(v2.camera.eye, v.camera.eye, rtol=1e-6)


def test_orbit_keeps_radius():
    # D/right re-scales eye->target distance (online_renderer.rs:152-161)
    v = _viewer()
    r0 = np.linalg.norm(np.asarray(v.camera.eye))
    for _ in range(5):
        v.tick(keys="d", focused=False)
    assert abs(np.linalg.norm(np.asarray(v.camera.eye)) - r0) < 1e-6



@pytest.mark.slow
def test_warmup_compiles_all_tiers():
    # warmup() must compile the step plus every raster tier so a
    # flythrough never jits mid-run (a measured ~20 s frame spike), and
    # leave the viewer fully functional.
    v = _viewer()
    v.warmup()
    assert v.runner.step_num == 1  # warmup runs exactly one real step
    from wgpu_n_body_tpu.runners import renderer as R

    assert R._medium_raster_fn.cache_info().currsize >= 1
    assert R._big_raster_fn.cache_info().currsize >= 1
    frame = v.tick(keys="w")
    assert frame[:8] == b"\x89PNG\r\n\x1a\n"
    assert v.runner.step_num == 2


def test_http_round_trip():
    from wgpu_n_body_tpu.runners.online import make_server

    v = _viewer()
    server, done = make_server(v, host="127.0.0.1", port=0)
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=30)
        conn.request("GET", "/")
        page = conn.getresponse().read()
        assert b"wgpu-n-body" in page and b"frame.png" in page

        conn.request("GET", "/frame.png?keys=w,q&focus=1")
        frame = conn.getresponse().read()
        assert frame[:8] == b"\x89PNG\r\n\x1a\n"

        conn.request("GET", "/stats")
        stats = json.loads(conn.getresponse().read())
        assert stats["steps"] == 1 and stats["frames"] == 1
        # w+q moved the camera off its default eye
        assert stats["eye"] != [0.0, 1.0, 2.0]

        # unfocused frame renders but does not step (visualize.rs:65-71)
        conn.request("GET", "/frame.png?focus=0")
        assert conn.getresponse().read()[:8] == b"\x89PNG\r\n\x1a\n"
        conn.request("GET", "/stats")
        assert json.loads(conn.getresponse().read())["steps"] == 1

        # Esc -> /quit sets the done event (visualize.rs:78-87)
        conn.request("GET", "/quit")
        assert conn.getresponse().read() == b"bye"
        assert done.wait(timeout=10)
    finally:
        server.shutdown()


def test_blend_lut_matches_host_f64_quantization():
    # entry k must be exactly png_bytes' quantization of the host f64
    # blend (f64 pow -> f32 cast -> clip -> *255 -> uint8 truncation)
    from wgpu_n_body_tpu.runners.renderer import blend_lut_u8, raster_blend

    lut = blend_lut_u8(0.25)
    ks = np.arange(400, dtype=np.int64).reshape(20, 20)
    img = raster_blend([ks])
    expect = (np.clip(img, 0.0, 1.0) * 255.0).astype(np.uint8)
    got = lut[np.minimum(ks, 255)]
    np.testing.assert_array_equal(got, expect)
    # the f32 cast saturates at k=61 for alpha=0.25; the clamp-at-255
    # indexing relies on the tail being constant
    assert lut[61] == 255 and (lut[61:] == 255).all()


def test_raster_blend_u8_device_matches_host():
    import jax.numpy as jnp

    from wgpu_n_body_tpu.runners.renderer import raster_blend, raster_blend_u8

    rng = np.random.default_rng(7)
    tiers = [
        rng.integers(0, 300, size=(32, 32)).astype(np.int32)
        for _ in range(3)
    ]
    expect = (
        np.clip(raster_blend(tiers), 0.0, 1.0) * 255.0
    ).astype(np.uint8)
    for k in (1, 2, 3):
        got = raster_blend_u8([jnp.asarray(t) for t in tiers[:k]])
        ref = (
            np.clip(raster_blend(tiers[:k]), 0.0, 1.0) * 255.0
        ).astype(np.uint8)
        np.testing.assert_array_equal(got, ref)
    assert expect.dtype == np.uint8  # host fallback path too
    np.testing.assert_array_equal(raster_blend_u8(tiers), expect)


def test_speculative_tiers_bit_equal_to_exact_render():
    # Drive a flythrough through every speculation transition (static ->
    # flagged -> tier-3 -> back off) and require each served PNG to be
    # bit-equal to the exact single-frame device render of the same
    # pre-step state (render_frame_on_device), regardless of which
    # tier passes the speculation dispatched or corrected.
    from wgpu_n_body_tpu.runners.renderer import render_frame_on_device

    v = _viewer(n=64, window=2)
    # march the camera through the disc and back out: footprints grow
    # past the tier-1 window (tier 2), then past _MEDIUM_WINDOW for
    # particles near znear (tier 3), then shrink again
    script = [""] * 2 + ["w"] * 8 + ["s"] * 6 + [""] * 2
    for i, keys in enumerate(script):
        pos_before = np.asarray(v.runner.state.pos)
        cam = v.camera
        for k in (keys.split(",") if keys else []):
            cam = cam.moved(KEYMAP[k], CONTROLLER_SPEED)
        expect_img = render_frame_on_device(
            pos_before, cam, v.width, v.height, window=v.window
        )
        expect = png_bytes(
            (np.clip(expect_img, 0.0, 1.0) * 255.0).astype(np.uint8),
            level=v.png_level,
        )
        got = v.tick(keys=keys)
        assert got == expect, f"frame {i} (keys={keys!r}) diverged"


def test_speculation_wasted_tier2_is_harmless():
    # force a tier-2 speculation on a frame with zero flagged
    # footprints: the pass must rasterize nothing and the frame must
    # match the exact render
    from wgpu_n_body_tpu.runners.renderer import render_frame_on_device

    v = _viewer(n=64)
    v._spec_t2, v._spec_t3_chunks = True, 1
    pos_before = np.asarray(v.runner.state.pos)
    expect_img = render_frame_on_device(
        pos_before, v.camera, v.width, v.height, window=v.window
    )
    expect = png_bytes(
        (np.clip(expect_img, 0.0, 1.0) * 255.0).astype(np.uint8),
        level=v.png_level,
    )
    assert v.tick() == expect
    assert v._spec_t2 is False and v._spec_t3_chunks == 0


if __name__ == "__main__":
    import sys

    sys.exit(pytest.main([__file__, "-q"]))
