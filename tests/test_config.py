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
    # All three untagged forms parse; wg round-trips as data only (the
    # reference's workgroup-size selection has no TPU analogue — see
    # PARITY.md "Architectural mappings").
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
    assert Resolution.dynamic(32).block() == (4, 32)
    assert Resolution.dynamic(8).block() == (16, 8)
    assert Resolution.sized(640, 480).block() == (8, 16)  # no hint
    bh, bw = Resolution.dynamic(7).block()  # non-divisor clamps down
    assert bh * bw == 128
