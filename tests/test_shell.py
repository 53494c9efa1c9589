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


# --- pjit fast-path self-healing (renderer.py:28-48) ---------------------
# The workaround string-matches jax 0.9's pjit cache-corruption message
# ("Execution supplied N buffers but compiled program expected M"). These
# tests pin the contract so a jax upgrade that rewords the message (or
# changes the exception type) fails loudly here instead of silently
# turning recovery into a hard crash in production.

def test_selfhealing_retries_on_buffer_mismatch(monkeypatch):
    from vvr_tpu.render.renderer import _call_jit_selfhealing
    import jax as _jax
    calls = {"n": 0, "cleared": 0}
    monkeypatch.setattr(_jax, "clear_caches",
                        lambda: calls.__setitem__("cleared",
                                                  calls["cleared"] + 1))

    def flaky():
        calls["n"] += 1
        if calls["n"] == 1:
            # simulate the observed jax 0.9 message (see docstring repro)
            raise ValueError(
                "Execution supplied 15 buffers but compiled program "
                "expected 25 buffers")
        return 42

    out, fired = _call_jit_selfhealing(flaky)
    assert out == 42 and fired is True
    assert calls["n"] == 2 and calls["cleared"] == 1


def test_selfhealing_propagates_unrelated_errors():
    from vvr_tpu.render.renderer import _call_jit_selfhealing

    def bad():
        raise ValueError("some other tracing error")

    with pytest.raises(ValueError, match="other tracing"):
        _call_jit_selfhealing(bad)


def test_selfhealing_message_shape_still_current():
    """Canary: the real pjit error at the heal site is a ValueError whose
    message contains 'buffers but compiled program expected'. The string
    is formatted in jaxlib's C++ runtime (libjax_common.so on jaxlib
    0.9.0); if a jaxlib upgrade renames/rewords it, this scan fails and
    renderer.py:28-48 must be re-pinned against the new text (or dropped
    if the underlying cache bug is fixed)."""
    import pathlib
    import jaxlib
    root = pathlib.Path(jaxlib.__file__).parent
    needle = b"buffers but compiled program expected"
    for so in sorted(root.glob("*.so")):
        if needle in so.read_bytes():
            return
    pytest.fail(
        "jaxlib no longer formats the buffer-count mismatch the "
        "workaround matches on — update _call_jit_selfhealing "
        "(renderer.py:28-48)")
