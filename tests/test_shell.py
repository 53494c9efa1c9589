"""App shell: input state machine, movement, ticker, app loop keybinds."""

import numpy as np
import pytest

from vvr_tpu.utils.input import ButtonState, Input
from vvr_tpu.utils.movement import Movement
from vvr_tpu.utils.ticker import Ticker
from vvr_tpu.utils.camera import Snapshot


def test_button_state_machine():
    inp = Input()
    inp.key_down("w")
    assert inp.get_button("w").pressed() and inp.get_button("w").held()
    inp.update()
    assert inp.get_button("w") is ButtonState.HELD
    inp.key_up("w")
    assert inp.get_button("w").released()
    inp.update()
    assert inp.get_button("w") is ButtonState.NONE


def test_bindings():
    inp = Input()
    inp.bind_button("forward", "w")
    inp.key_down("w")
    assert inp.get_button("forward").pressed()


def test_ticker_rate():
    t = Ticker()
    fires = sum(t.update(1.0 / 100.0) for _ in range(100))  # 1 s at 100 fps
    assert 45 <= fires <= 51  # ~50 ticks/s, max 1/frame


def test_movement_flies_forward():
    m = Movement(snapshots=[])
    inp = Input()
    inp.bind_button("forward", "w")
    inp.key_down("w")
    for _ in range(60):
        m.update(inp, 1.0 / 60.0)
        inp.update()
        inp.key_down("w")
    # default rotation looks down -z; it should have moved that way
    assert m.position[2] < -1.0
    assert abs(m.position[0]) < 1e-3


def test_movement_boost_scroll_fov():
    m = Movement(snapshots=[], fov=90.0)
    inp = Input()
    inp.bind_button("boost", "shift")
    inp.scroll(-2.0)          # scroll without boost -> fov up
    m.update(inp, 1.0 / 60.0)
    assert m.target_fov > 90.0
    inp.update()
    inp.key_down("shift")
    inp.scroll(1.0)           # scroll while boosting -> boost up, fov frozen
    tf = m.target_fov
    m.update(inp, 1.0 / 60.0)
    assert m.boost > 0.0
    assert m.target_fov == tf


def test_movement_snapshot_cycle():
    snaps = [Snapshot(np.array([i, 0, 0], np.float32),
                      np.array([0, 0, 0, 1], np.float32), 90.0)
             for i in range(3)]
    m = Movement(snapshots=snaps)
    inp = Input()
    inp.bind_button("toggle_fixed", "i")
    inp.bind_button("cycle_snapshot", "o")
    inp.key_down("i")
    m.update(inp, 1 / 60)
    assert m.fixed_mode_snapshot_index == 0
    assert m.position[0] == 0
    inp.update()
    inp.key_down("o")
    m.update(inp, 1 / 60)
    assert m.position[0] == 1


@pytest.mark.full
@pytest.mark.parametrize("frames", [3])
def test_app_loop_headless(frames, small_world):
    from vvr_tpu.app import App
    from vvr_tpu.config import RenderConfig, WorldConfig
    from vvr_tpu.render.renderer import Renderer
    from vvr_tpu.render.scene import Scene, build_scene

    cfg_w, chunks, occ = small_world
    from vvr_tpu.world.pyramid import build_brick_pyramid
    scene = Scene(cfg_w, chunks, build_brick_pyramid(occ), None, None,
                  np.zeros((100, 4), np.float32))
    r = Renderer(cfg_w, RenderConfig(width=64, height=48, shadow_samples=0,
                                     max_ray_iterations=1,
                                     skybox_resolution=16,
                                     clouds_resolution=16,
                                     bloom_enabled=False), scene=scene)
    app = App(r)

    keys = []
    def script(frame, inp):
        if frame == 1:
            inp.key_down("p")   # print timings
            inp.key_down("h")   # cycle debug view
        if frame == 2:
            inp.key_down("q")   # quit

    frames_out = []
    n = app.run(max_frames=10, script=script,
                frame_sink=lambda f, img: frames_out.append(img.shape))
    assert n == 3  # quit on frame 2 (processed after increment)
    assert all(s == (48, 64, 3) for s in frames_out)


def test_renderer_benchmark_capture(small_world):
    """The L-key capture benchmark end to end (statistics.rs:43-64 analog)."""
    import numpy as np
    from vvr_tpu.config import RenderConfig
    from vvr_tpu.render.renderer import Renderer
    from vvr_tpu.render.scene import Scene
    from vvr_tpu.world.pyramid import build_brick_pyramid

    cfg_w, chunks, occ = small_world
    scene = Scene(cfg_w, chunks, build_brick_pyramid(occ), None, None,
                  np.zeros((100, 4), np.float32))
    r = Renderer(cfg_w, RenderConfig(width=48, height=32, shadow_samples=0,
                                     max_ray_iterations=1,
                                     skybox_resolution=16,
                                     clouds_resolution=16,
                                     bloom_enabled=False), scene=scene)
    cam = r.camera_for_snapshot(0)
    res = r.benchmark(cam, duration_s=0.05, warmup=1)
    assert res["samples"] >= 1
    assert res["avg_ms"] > 0
    assert res["mrays_per_s"] > 0
    assert res["fps"] > 0
