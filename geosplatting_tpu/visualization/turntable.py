"""Turntable camera schedule for training-time visualization dumps.

Parity target: ``rfstudio/visualization/_optimization_visualizer.py:10-72`` —
an orbit of ``spin_resolution`` cameras, an eased (x**k / k) spin position per
training step, and a frame emitted whenever the integer frame index advances;
consumed by the train loop (``engine/train.py:72,82,98-101``).
"""
from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from ..graphics.cameras import Cameras


@dataclasses.dataclass
class OptimizationVisualizer:
    center: tuple = (0.0, 0.0, 0.0)
    up: str = "disable"           # '+y' | '+z' | 'disable'
    spin_resolution: int = 4096
    resolution: tuple = (800, 800)
    pitch_degree: float = 30.0
    radius: float = 3.2
    fov_degrees: float = 40.0

    num_ease_in_step: int = 300
    ease_exponent: float = 0.25
    frame_begin: int | None = None
    frame_end: int | None = None
    num_spins: float = 3.0
    num_frames_per_spin: int = 80

    def setup(self, num_steps: int) -> None:
        """Precompute step -> orbit-index schedule (reference :44-67)."""
        self._sequence: dict[int, int] = {}
        if self.up == "disable":
            self._cameras = None
            return
        assert self.ease_exponent > 0
        self._cameras = Cameras.from_orbit(
            center=jnp.asarray(self.center),
            radius=self.radius,
            elevation_degrees=self.pitch_degree,
            num_samples=self.spin_resolution,
            fov_degrees=self.fov_degrees,
            width=self.resolution[0],
            height=self.resolution[1],
        )
        frame_end = num_steps if self.frame_end is None else self.frame_end
        offset = self.frame_begin or 0
        spin_per_step = self.num_spins / (
            self.num_ease_in_step * (1 / self.ease_exponent - 1) + frame_end
        )
        last_frame = -1
        for curr_step in range(1 + offset, num_steps + offset + 1):
            if curr_step <= self.num_ease_in_step:
                eased = (
                    self.num_ease_in_step / self.ease_exponent
                    * ((curr_step - 1) / self.num_ease_in_step) ** self.ease_exponent
                )
            else:
                eased = (
                    self.num_ease_in_step / self.ease_exponent
                    + (curr_step - self.num_ease_in_step)
                )
            frame = spin_per_step * eased * self.num_frames_per_spin
            if int(frame) > last_frame:
                self._sequence[curr_step - offset] = round(
                    spin_per_step * eased * self.spin_resolution
                )
                last_frame = int(frame)

    def get_camera(self, curr_step: int) -> Cameras | None:
        if self._cameras is None or curr_step not in self._sequence:
            return None
        return self._cameras[self._sequence[curr_step] % self.spin_resolution]
