"""Host-side visualization layer.

Replaces the reference's rfviser/web stack (``rfstudio/visualization/``) with
exportable artifacts that need no server: a standalone WebGL gaussian-splat
viewer HTML (``vis_3dgs``), turntable camera schedules for training dumps
(``OptimizationVisualizer``), an offline animation compositor (``Director``),
and paper-figure grids (``TabularFigures``).
"""
from .director import Director, Fade, Grid, Leaf  # noqa: F401
from .figures import TabularFigures, highlight_crop  # noqa: F401
from .turntable import OptimizationVisualizer  # noqa: F401
from .viewer_html import vis_3dgs  # noqa: F401
