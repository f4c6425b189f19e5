"""Console UI: status spinners, progress bars, and a live training dashboard.

Parity target: ``rfstudio/ui/console/_proxy.py:26-106`` (``status``,
``progress``, ``screen`` full-screen dashboard with metric tables, loss
plot, progress bars) rebuilt on rich (plotext is not in this image; the
loss plot is a unicode sparkline)."""
from __future__ import annotations

import contextlib
from typing import Iterable, Iterator

from rich.console import Console as _RichConsole
from rich.live import Live
from rich.progress import (
    BarColumn, Progress, TextColumn, TimeElapsedColumn, TimeRemainingColumn,
)
from rich.table import Table

_SPARK = "▁▂▃▄▅▆▇█"


def sparkline(values: list[float], width: int = 60) -> str:
    if not values:
        return ""
    vals = values[-width:]
    lo, hi = min(vals), max(vals)
    rng = (hi - lo) or 1.0
    return "".join(_SPARK[int((v - lo) / rng * (len(_SPARK) - 1))] for v in vals)


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
    def screen(self, title: str = "Training"):
        """Live dashboard handle: call ``update(step, metrics)`` each step;
        keeps a loss sparkline + latest metric table (train.py:58-70 analog)."""
        state = {"losses": [], "metrics": {}, "step": 0}

        def render():
            table = Table(title=title, expand=False)
            table.add_column("metric")
            table.add_column("value")
            table.add_row("step", str(state["step"]))
            for k, v in state["metrics"].items():
                table.add_row(k, f"{v:.5g}" if isinstance(v, float) else str(v))
            if state["losses"]:
                table.add_row("loss curve", sparkline(state["losses"]))
            return table

        with Live(render(), console=self._console, refresh_per_second=4) as live:

            def update(step: int, metrics: dict) -> None:
                state["step"] = step
                state["metrics"] = {
                    k: float(v) if hasattr(v, "item") else v
                    for k, v in metrics.items()
                }
                if "loss" in state["metrics"]:
                    state["losses"].append(state["metrics"]["loss"])
                live.update(render())

            yield update


console = ConsoleProxy()
