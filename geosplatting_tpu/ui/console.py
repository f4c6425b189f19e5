"""Console UI: status spinners, progress bars, and a live training dashboard.

Parity target: ``rfstudio/ui/console/_proxy.py:26-106`` + the screen widget
set (``ui/console/screen/{plot,progress,table,layout}.py``): ``status``,
``progress``, and a full-screen ``screen`` dashboard with a declarative
column/row layout, multi-row loss plot, metric tables, and a progress bar —
rebuilt on rich (plotext is not in this image; the plot is a block-char
line chart)."""
from __future__ import annotations

import contextlib
from typing import Iterable, Iterator

from rich.console import Console as _RichConsole, Group
from rich.layout import Layout
from rich.live import Live
from rich.panel import Panel
from rich.progress import (
    BarColumn, Progress, TextColumn, TimeElapsedColumn, TimeRemainingColumn,
)
from rich.table import Table
from rich.text import Text

_SPARK = "▁▂▃▄▅▆▇█"


def sparkline(values: list[float], width: int = 60) -> str:
    if not values:
        return ""
    vals = values[-width:]
    lo, hi = min(vals), max(vals)
    rng = (hi - lo) or 1.0
    return "".join(_SPARK[int((v - lo) / rng * (len(_SPARK) - 1))] for v in vals)


def line_plot(
    values: list[float], width: int = 60, height: int = 8,
    label: str = "",
) -> str:
    """Multi-row block-character line chart (the plotext live-plot analog,
    ui/console/screen/plot.py)."""
    if not values:
        return ""
    vals = values[-width:]
    lo, hi = min(vals), max(vals)
    rng = (hi - lo) or 1.0
    rows = [[" "] * len(vals) for _ in range(height)]
    for x, v in enumerate(vals):
        y = (v - lo) / rng * (height - 1)
        r = height - 1 - int(y)
        frac = y - int(y)
        rows[r][x] = _SPARK[min(int(frac * len(_SPARK)), len(_SPARK) - 1)]
        for rr in range(r + 1, height):
            rows[rr][x] = _SPARK[-1]
    out = [f"{hi:9.4g} ┤" + "".join(rows[0])]
    out += ["          │" + "".join(r) for r in rows[1:-1]]
    out += [f"{lo:9.4g} ┤" + "".join(rows[-1])]
    if label:
        out.append("          " + label)
    return "\n".join(out)


class ConsoleProxy:
    def __init__(self) -> None:
        self._console = _RichConsole()

    def print(self, *args, **kwargs) -> None:
        self._console.print(*args, **kwargs)

    @contextlib.contextmanager
    def status(self, desc: str = "Working"):
        with self._console.status(desc):
            yield

    @contextlib.contextmanager
    def progress(self, desc: str = "Progress", transient: bool = False):
        prog = Progress(
            TextColumn("[bold blue]{task.description}"),
            BarColumn(),
            TextColumn("{task.completed}/{task.total}"),
            TimeElapsedColumn(),
            TimeRemainingColumn(),
            console=self._console,
            transient=transient,
        )

        def track(iterable: Iterable, total: int | None = None) -> Iterator:
            items = list(iterable) if total is None else iterable
            n = total if total is not None else len(items)
            task = prog.add_task(desc, total=n)

            def gen():
                for item in items:
                    yield item
                    prog.advance(task)

            return gen()

        with prog:
            yield track

    @contextlib.contextmanager
    def screen(
        self,
        title: str = "Training",
        num_steps: int | None = None,
        plot_key: str = "loss",
        compact: bool = False,
    ):
        """Live dashboard handle: call ``update(step, metrics)`` each step.

        Full layout (train.py:58-70 analog): a loss line plot on the left, a
        train/val metric table on the right, and a run progress bar below.
        ``compact=True`` falls back to the single metric table."""
        state = {"curve": [], "metrics": {}, "step": 0}

        def metric_table():
            table = Table(title=None, expand=True, show_edge=False)
            table.add_column("metric")
            table.add_column("value", justify="right")
            table.add_row("step", str(state["step"]))
            for k, v in state["metrics"].items():
                table.add_row(k, f"{v:.5g}" if isinstance(v, float) else str(v))
            return table

        def render():
            if compact:
                t = metric_table()
                if state["curve"]:
                    t.add_row(plot_key, sparkline(state["curve"]))
                return Panel(t, title=title)
            layout = Layout()
            plot = Text(
                line_plot(state["curve"], label=plot_key)
                if state["curve"] else "(waiting for metrics)"
            )
            top = Layout()
            top.split_row(
                Layout(Panel(plot, title=plot_key), ratio=3),
                Layout(Panel(metric_table(), title="metrics"), ratio=2),
            )
            rows = [top]
            if num_steps:
                frac = min(state["step"] / max(num_steps, 1), 1.0)
                done = int(frac * 50)
                bar = Text(
                    f"step {state['step']}/{num_steps}  "
                    + "━" * done + "─" * (50 - done) + f"  {frac:5.1%}"
                )
                rows.append(Layout(Panel(bar, title="progress"), size=3))
            layout.split_column(*rows)
            return Panel(layout, title=title, height=16 + (3 if num_steps else 0))

        with Live(render(), console=self._console, refresh_per_second=4) as live:

            def update(step: int, metrics: dict) -> None:
                state["step"] = step
                state["metrics"] = {
                    k: float(v) if hasattr(v, "item") else v
                    for k, v in metrics.items()
                }
                if plot_key in state["metrics"]:
                    state["curve"].append(state["metrics"][plot_key])
                live.update(render())

            yield update


console = ConsoleProxy()
