"""Camera selectors (parity: ``rfstudio/data/selector.py:18-58``):
``FanSelector`` picks cameras within angular wedges around the scene;
``SliceSelector`` picks contiguous index ranges."""
from __future__ import annotations

import dataclasses

import numpy as np


@dataclasses.dataclass(frozen=True)
class SliceSelector:
    start: int = 0
    stop: int | None = None
    step: int = 1

    def select(self, num_cameras: int, c2w: np.ndarray | None = None) -> np.ndarray:
        return np.arange(num_cameras)[self.start: self.stop: self.step]


@dataclasses.dataclass(frozen=True)
class FanSelector:
    """Keep cameras whose azimuth (around +z, measured from +x) lies within
    [center - half_angle, center + half_angle] degrees."""

    center_degrees: float = 0.0
    half_angle_degrees: float = 45.0

    def select(self, num_cameras: int, c2w: np.ndarray) -> np.ndarray:
        pos = c2w[:, :3, 3]
        az = np.degrees(np.arctan2(pos[:, 1], pos[:, 0]))
        diff = (az - self.center_degrees + 180.0) % 360.0 - 180.0
        return np.nonzero(np.abs(diff) <= self.half_angle_degrees)[0]
