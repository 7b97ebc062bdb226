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


def test_resolution_wg_gcd():
    # Sized: GCD of dimensions, clamped to 16 when wg*wg > 256
    # (mod.rs:79-105).
    assert Resolution.sized(384, 288).wg() == 16  # gcd=96 -> clamp
    assert Resolution.sized(30, 20).wg() == 10  # gcd=10, 100<=256
    assert Resolution.dynamic(8).wg() == 8
    assert Resolution.dynamic(64).wg() == 16  # clamp
    assert Resolution.fixed(512, 512, 4).wg() == 4


def test_resolution_json_forms():
    assert Resolution.from_json(16).wg_hint == 16  # Dynamic
    r = Resolution.from_json({"width": 384, "height": 288})
    assert r.size() == (384, 288)
    r = Resolution.from_json({"size": {"width": 10, "height": 20}, "wg": 2})
    assert r.size() == (10, 20)
    assert r.wg() == 2
