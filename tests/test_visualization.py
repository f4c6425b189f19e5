"""Visualization layer: turntable schedule, director compositing, figures,
splat-viewer HTML export, video renderer backends."""
import numpy as np

import jax
import jax.numpy as jnp

from geosplatting_tpu.data.io import open_video_renderer
from geosplatting_tpu.graphics.splats import Splats
from geosplatting_tpu.visualization import (
    Director, Fade, Grid, Leaf, OptimizationVisualizer, TabularFigures,
    vis_3dgs,
)
from geosplatting_tpu.visualization.director import Highlight, Static, Text
from geosplatting_tpu.visualization.figures import highlight_crop


def test_turntable_schedule():
    viz = OptimizationVisualizer(
        up="+z", spin_resolution=256, resolution=(32, 32),
        num_ease_in_step=20, num_spins=1.0, num_frames_per_spin=10,
    )
    viz.setup(num_steps=100)
    cams = [viz.get_camera(s) for s in range(1, 101)]
    hits = [c for c in cams if c is not None]
    # roughly one frame per spin-fraction; eased start means frames cluster late
    assert 5 <= len(hits) <= 15
    assert all(c.c2w.shape == (3, 4) for c in hits)
    # disabled mode yields nothing
    off = OptimizationVisualizer(up="disable")
    off.setup(10)
    assert off.get_camera(1) is None


def test_director_grid_fade_highlight(tmp_path):
    rng = np.random.default_rng(0)
    frames = [rng.uniform(size=(24, 24, 3)).astype(np.float32) for _ in range(4)]
    root = Grid(
        children=[
            [Fade(Leaf(frames), duration=2), Static((0.2, 0.4, 0.6))],
            [Highlight(Leaf(frames), crop=(0.2, 0.2, 0.6, 0.6)), Text("hi")],
        ],
        cell=(48, 48), gap=2,
    )
    d = Director(root, fps=4)
    out = list(d.frames())
    assert len(out) == 4
    h = 2 * 48 + 3 * 2
    w = 2 * 48 + 3 * 2
    assert out[0].shape == (h, w, 3)
    assert np.isfinite(out[-1]).all()
    # fade-in: first frame of the faded cell is all background (white)
    cell0 = out[0][2:50, 2:50]
    assert cell0.min() > 0.9
    d.write(tmp_path / "anim.gif")
    assert (tmp_path / "anim.gif").stat().st_size > 0


def test_tabular_figures(tmp_path):
    rng = np.random.default_rng(1)
    img = rng.uniform(size=(32, 32, 3)).astype(np.float32)
    fig = TabularFigures(
        rows={"ours": {"a": img, "b": img}, "ref": {"a": img}},
        cell=(40, 40), crop=(0.25, 0.25, 0.75, 0.75),
    )
    out = fig.render()
    assert out.ndim == 3 and np.isfinite(out).all()
    fig.save(tmp_path / "fig.png")
    assert (tmp_path / "fig.png").stat().st_size > 0
    marked, region = highlight_crop(img, (0.0, 0.0, 0.5, 0.5))
    assert region.shape == (16, 16, 3)
    assert marked[0, 0, 0] == 1.0  # border drawn


def test_vis_3dgs_html(tmp_path):
    s = Splats.random(jax.random.key(0), 64, sh_degree=0, random_scale=0.5)
    p = vis_3dgs(s, tmp_path / "view.html")
    html = p.read_text()
    assert html.count("`") % 2 == 0
    for ch, closing in (("{", "}"), ("(", ")"), ("[", "]")):
        assert html.count(ch) == html.count(closing), ch
    # data round-trips: 64 gaussians x 32 bytes
    import base64, re
    m = re.search(r'const B64 = "([^"]*)"', html)
    assert len(base64.b64decode(m.group(1))) == 64 * 32


def test_video_renderer_png_fallback(tmp_path):
    with open_video_renderer(tmp_path / "clip.mp4", fps=8) as put:
        put(np.zeros((8, 8, 3)))
        put(np.ones((8, 8, 3)))
    # either a real mp4 was encoded or the png-sequence fallback fired
    ok = (tmp_path / "clip.mp4").exists() or (
        (tmp_path / "clip" / "frame_00000.png").exists()
    )
    assert ok


def test_console_screen_dashboard():
    from geosplatting_tpu.ui.console import console, line_plot, sparkline

    assert len(sparkline([1.0, 2.0, 3.0])) == 3
    plot = line_plot([3.0, 2.0, 1.0, 2.0], width=10, height=4, label="loss")
    assert plot.count("\n") == 4  # 4 rows + label line
    with console.screen("t", num_steps=3) as upd:
        for s in range(1, 4):
            upd(s, {"loss": 1.0 / s, "psnr": float(s)})
    with console.screen("t2", compact=True) as upd:
        upd(1, {"loss": 0.5})


def test_vis_colmap_html(tmp_path):
    from tests.test_points_colmap import write_colmap_fixture

    from geosplatting_tpu.visualization.viewer_html import vis_colmap

    write_colmap_fixture(tmp_path)
    out = vis_colmap(tmp_path, tmp_path / "colmap.html")
    html = out.read_text()
    assert "<html" in html.lower() and len(html) > 10_000
    # frusta + points made it into the embedded buffer
    assert "__DATA__" not in html
