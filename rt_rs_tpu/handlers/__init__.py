"""Acceleration-backend registry.

Mirrors the reference's set of ``IntrsHandler`` implementations
(``src/lib/handlers/mod.rs``): ``blank``, ``naive``, ``bvh``,
``rf_bvh`` — plus TPU-only additions (``lbvh`` on-device build).
"""

from __future__ import annotations

from typing import Any, Callable

from rt_rs_tpu.handlers.base import IntrsHandler, IntrsStats

_REGISTRY: dict[str, Callable[..., IntrsHandler]] = {}


def register(name: str, factory: Callable[..., IntrsHandler]) -> None:
    _REGISTRY[name] = factory


def get_handler(name: str, **kwargs: Any) -> IntrsHandler:
    try:
        factory = _REGISTRY[name]
    except KeyError:
        raise ValueError(
            f"unknown handler {name!r}; available: {sorted(_REGISTRY)}"
        ) from None
    return factory(**kwargs)


def available() -> list[str]:
    return sorted(_REGISTRY)


def _register_builtin() -> None:
    from rt_rs_tpu.handlers.blank import BlankIntrs
    from rt_rs_tpu.handlers.naive import BasicIntrs

    register("blank", BlankIntrs)
    register("naive", BasicIntrs)

    try:
        from rt_rs_tpu.handlers.bvh import BvhIntrs

        register("bvh", BvhIntrs)
    except ImportError:  # pragma: no cover - during bring-up
        pass

    try:
        from rt_rs_tpu.handlers.rf import RfBvhIntrs

        register("rf_bvh", RfBvhIntrs)
    except ImportError:  # pragma: no cover
        pass

    try:
        from rt_rs_tpu.handlers.pbvh import PacketBvhIntrs

        register("pbvh", PacketBvhIntrs)
    except ImportError:  # pragma: no cover
        pass

    try:
        from rt_rs_tpu.handlers.lbvh import LbvhIntrs

        register("lbvh", LbvhIntrs)
    except ImportError:  # pragma: no cover
        pass


_register_builtin()

__all__ = [
    "IntrsHandler",
    "IntrsStats",
    "get_handler",
    "register",
    "available",
]
