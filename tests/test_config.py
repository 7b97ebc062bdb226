"""Config parity tests (src/lib/mod.rs:56-166)."""

from rt_rs_tpu.config import ComputeConfig, Config, Resolution


def test_compute_defaults():
    cfg = ComputeConfig()
    assert cfg.t_min == 0.01
    assert cfg.t_max == 1000.0
    assert cfg.camera_light_source == 0.0
    assert cfg.bounces == 4
    assert cfg.eps == 1e-7
    assert cfg.ambience == 0.1


def test_partial_json_uses_defaults():
    cfg = ComputeConfig.from_json({"bounces": 2})
    assert cfg.bounces == 2
    assert cfg.t_max == 1000.0
    full = Config.from_json({})
    assert full.fps == 60


def test_resolution_json_forms():
    # All three untagged forms parse.
    assert Resolution.from_json(16).wg_hint == 16  # Dynamic
    r = Resolution.from_json({"width": 384, "height": 288})
    assert r.size() == (384, 288)
    assert r.wg_hint is None
    r = Resolution.from_json({"size": {"width": 10, "height": 20}, "wg": 2})
    assert r.size() == (10, 20)
    assert r.wg_hint == 2


def test_resolution_block_from_wg_hint():
    """Resolution.block() is the wg() analogue: the packet pixel-block
    shape, wg wide x 128/wg tall (mod.rs:79-105 -> camera_rays block)."""
    from rt_rs_tpu.config import Resolution

    assert Resolution().block() == (8, 16)  # default wg=16
    # Explicit wg=32 exceeds the reference's wg^2 <= 256 ceiling and
    # collapses to 16 (mod.rs:103-104) — even for Dynamic/Fixed.
    assert Resolution.dynamic(32).block() == (8, 16)
    assert Resolution.dynamic(8).block() == (16, 8)
    # Sized derives wg from gcd(w, h) with the wg^2 <= 256 clamp:
    # gcd(640, 480) = 160 -> 160^2 > 256 -> 16 (mod.rs:79-105).
    assert Resolution.sized(640, 480).block() == (8, 16)
    bh, bw = Resolution.dynamic(7).block()  # non-divisor clamps down
    assert bh * bw == 128


def test_resolution_wg_selection():
    """Resolution.wg() reproduces mod.rs:79-105 exactly."""
    assert Resolution.dynamic(8).wg() == 8  # explicit
    assert Resolution.fixed(100, 100, 4).wg() == 4  # explicit
    assert Resolution.sized(100, 60).wg() == 16  # gcd 20 -> 400 > 256
    assert Resolution.sized(24, 36).wg() == 12  # gcd 12 -> 144 <= 256
    assert Resolution.sized(33, 20).wg() == 1  # coprime
    assert Resolution.dynamic(64).wg() == 16  # clamp: 64^2 > 256
    # block() clamps the derived wg down to a lane divisor: 12 -> 8.
    assert Resolution.sized(24, 36).block() == (16, 8)
