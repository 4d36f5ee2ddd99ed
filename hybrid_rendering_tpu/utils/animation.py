"""Camera & light animation — DemoPlayer + the reference's state machines.

Replaces dw::DemoPlayer spline fly-throughs (SURVEY §2.9; keyframe arrays
common.cpp:96-297), the free/fixed/animated camera types with side-to-side
test motion (main.cpp:1023-1080), and update_light_animation
(main.cpp:994-1019: animated spot for the GI scene + orbiting directional).
All host-side (produces per-frame camera/light parameters; the device sees
only matrices/scalars).
"""
from __future__ import annotations

import dataclasses
from typing import List, Sequence, Tuple

import numpy as np

from hybrid_rendering_tpu.types import Light


@dataclasses.dataclass
class Keyframe:
    position: Tuple[float, float, float]
    target: Tuple[float, float, float]
    time: float  # seconds from start


def _catmull_rom(p0, p1, p2, p3, t):
    """Centripetal-ish Catmull-Rom interpolation (DemoPlayer playback)."""
    t2 = t * t
    t3 = t2 * t
    return 0.5 * (
        2.0 * p1
        + (-p0 + p2) * t
        + (2.0 * p0 - 5.0 * p1 + 4.0 * p2 - p3) * t2
        + (-p0 + 3.0 * p1 - 3.0 * p2 + p3) * t3
    )


class DemoPlayer:
    """Spline playback over keyframes: play/stop/update(delta) -> camera
    params (dw::DemoPlayer, common.cpp:315-321, main.cpp:1075)."""

    def __init__(self, keyframes: Sequence[Keyframe]):
        assert len(keyframes) >= 2
        self.keyframes = list(keyframes)
        self.time = 0.0
        self.playing = False

    def play(self):
        self.playing = True
        self.time = 0.0

    def stop(self):
        self.playing = False
        self.time = 0.0

    @property
    def duration(self) -> float:
        return self.keyframes[-1].time

    def update(self, delta: float):
        """Advance and return (eye, target). Loops at the end."""
        if self.playing:
            self.time = (self.time + delta) % max(self.duration, 1e-6)
        return self.sample(self.time)

    def sample(self, t: float):
        kf = self.keyframes
        seg = 0
        for i in range(len(kf) - 1):
            if kf[i].time <= t <= kf[i + 1].time:
                seg = i
                break
        else:
            seg = len(kf) - 2
        t0, t1 = kf[seg].time, kf[seg + 1].time
        u = 0.0 if t1 <= t0 else (t - t0) / (t1 - t0)

        def pget(i, attr):
            i = int(np.clip(i, 0, len(kf) - 1))
            return np.asarray(getattr(kf[i], attr), np.float64)

        eye = _catmull_rom(
            pget(seg - 1, "position"), pget(seg, "position"),
            pget(seg + 1, "position"), pget(seg + 2, "position"), u,
        )
        target = _catmull_rom(
            pget(seg - 1, "target"), pget(seg, "target"),
            pget(seg + 1, "target"), pget(seg + 2, "target"), u,
        )
        return tuple(eye), tuple(target)


@dataclasses.dataclass
class CameraRig:
    """Free/fixed/animated camera state machine (main.cpp:1023-1080)."""

    eye: Tuple[float, float, float]
    target: Tuple[float, float, float]
    mode: str = "fixed"  # fixed | animated | side_to_side
    side_to_side_amplitude: float = 2.0
    side_to_side_speed: float = 1.0
    player: DemoPlayer | None = None
    _time: float = 0.0

    def update(self, delta: float):
        """Returns (eye, target) for this frame."""
        self._time += delta
        if self.mode == "animated" and self.player is not None:
            return self.player.update(delta)
        if self.mode == "side_to_side":
            # side-to-side test motion stressing reprojection
            # (main.cpp:513-522, 1056-1060)
            off = self.side_to_side_amplitude * np.sin(
                self._time * self.side_to_side_speed * 2.0 * np.pi
            )
            e = np.asarray(self.eye, np.float64)
            return (e[0] + off, e[1], e[2]), self.target
        return self.eye, self.target


def animate_orbit_light(light: Light, time_s: float, speed: float = 0.2) -> Light:
    """Orbiting directional light (main.cpp:1010-1019)."""
    a = time_s * speed * 2.0 * np.pi
    d = np.asarray([np.sin(a) * 0.6, 0.85, np.cos(a) * 0.6], np.float32)
    d /= np.linalg.norm(d)
    import jax.numpy as jnp

    return light.replace(direction=jnp.asarray(d))


def animate_spot_light(light: Light, time_s: float,
                       radius: float = 2.0, speed: float = 0.3) -> Light:
    """Animated spot circling above the GI scene (main.cpp:994-1008)."""
    import jax.numpy as jnp

    a = time_s * speed * 2.0 * np.pi
    base = np.asarray(light.position)
    pos = base + np.asarray([np.cos(a) * radius, 0.0, np.sin(a) * radius])
    return light.replace(position=jnp.asarray(pos.astype(np.float32)))
