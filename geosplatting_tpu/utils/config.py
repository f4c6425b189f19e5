"""Config-as-code serialization + a dataclass CLI.

Parity targets: ``rfstudio/utils/dataclass.py:60-108`` (dump any nested
dataclass as an executable Python script and re-import it — the reference's
"checkpoint of config" trick, kept because it is genuinely good) and the
tyro-based ``Task``/``TaskGroup`` subcommand surface
(``rfstudio/engine/task.py:104,170``) rebuilt on argparse (tyro is not in
this image)."""
from __future__ import annotations

import argparse
import dataclasses
import importlib.util
import sys
from pathlib import Path
from typing import Any


def dump_dataclass_as_str(obj: Any, name: str = "task") -> str:
    """Serialize a (nested) dataclass instance as an executable script that
    rebuilds it into a module-level variable ``task``."""
    modules = {}

    def render(x) -> str:
        if dataclasses.is_dataclass(x) and not isinstance(x, type):
            cls = type(x)
            modules[cls.__module__] = None
            fields = []
            for f in dataclasses.fields(x):
                v = getattr(x, f.name)
                default = f.default if f.default is not dataclasses.MISSING else (
                    f.default_factory() if f.default_factory is not dataclasses.MISSING else dataclasses.MISSING
                )
                try:
                    skip = v == default
                except Exception:
                    skip = False
                if skip is True:
                    continue
                fields.append(f"{f.name}={render(v)}")
            return f"{cls.__module__}.{cls.__qualname__}({', '.join(fields)})"
        if isinstance(x, Path):
            modules["pathlib"] = None
            return f"pathlib.Path({str(x)!r})"
        if isinstance(x, (list, tuple)):
            inner = ", ".join(render(v) for v in x)
            return f"[{inner}]" if isinstance(x, list) else f"({inner},)" if len(x) == 1 else f"({inner})"
        if isinstance(x, dict):
            return "{" + ", ".join(f"{render(k)}: {render(v)}" for k, v in x.items()) + "}"
        return repr(x)

    body = render(obj)
    imports = "\n".join(f"import {m}" for m in sorted(modules))
    return f"{imports}\n\n{name} = {body}\n"


def load_dataclass(script_path: Path, name: str = "task") -> Any:
    """Execute a dumped config script and return its ``task`` object."""
    spec = importlib.util.spec_from_file_location("_loaded_task", script_path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return getattr(mod, name)


# --- dataclass CLI ------------------------------------------------------------


def _resolve_field_type(cls, f: dataclasses.Field):
    """Concrete python type for a dataclass field — resolves string
    annotations (PEP 563) and unwraps ``X | None`` unions."""
    import typing

    t = f.type
    if isinstance(t, str):
        try:
            t = typing.get_type_hints(cls).get(f.name, str)
        except Exception:
            return str
    origin = typing.get_origin(t)
    if origin is typing.Union or str(origin) == "<class 'types.UnionType'>":
        args = [a for a in typing.get_args(t) if a is not type(None)]
        t = args[0] if args else str
    return t if isinstance(t, type) else str


def _add_dataclass_args(parser: argparse.ArgumentParser, cls, prefix: str = ""):
    from pathlib import Path as _Path

    for f in dataclasses.fields(cls):
        name = f"{prefix}{f.name}"
        if dataclasses.is_dataclass(type(f.default)) and not isinstance(
            f.default, type
        ):
            _add_dataclass_args(parser, type(f.default), prefix=f"{name}.")
            continue
        typ = _resolve_field_type(cls, f)
        if dataclasses.is_dataclass(typ):
            _add_dataclass_args(parser, typ, prefix=f"{name}.")
        elif typ is bool:
            parser.add_argument(f"--{name}", type=lambda s: s.lower() in ("1", "true", "yes"))
        elif typ in (int, float, str):
            parser.add_argument(f"--{name}", type=typ)
        elif typ is _Path:
            parser.add_argument(f"--{name}", type=_Path)
        else:
            parser.add_argument(f"--{name}", type=str)


def _apply_overrides(obj, overrides: dict[str, Any]):
    """Rebuild a frozen dataclass tree with dotted-path overrides."""
    by_child: dict[str, dict] = {}
    direct = {}
    for k, v in overrides.items():
        if v is None:
            continue
        if "." in k:
            head, rest = k.split(".", 1)
            by_child.setdefault(head, {})[rest] = v
        else:
            direct[k] = v
    changes = dict(direct)
    for head, sub in by_child.items():
        changes[head] = _apply_overrides(getattr(obj, head), sub)
    return dataclasses.replace(obj, **changes) if changes else obj


def run_task_group(tasks: dict[str, Any], argv: list[str] | None = None) -> Any:
    """The TaskGroup CLI (engine/task.py:170-194): each named preset becomes
    a subcommand whose dataclass fields are ``--dotted.path`` flags. Returns
    the configured task after calling its ``run()``.

    Task-runtime flags (engine/task.py:104-241 parity):
    ``--profiling PATH`` dumps cProfile pstats; ``--trace DIR`` captures a
    jax.profiler trace (the TPU-native analog of the reference's cProfile
    option, SURVEY §5); ``--auto-breakpoint`` drops into pdb post-mortem on
    crash (task.py:224-237)."""
    # persist compiles across task invocations (round 5): the production
    # chain is 4 separate CLI processes whose programs each cold-compile
    # through the remote tunnel for tens of minutes — the repo-local cache
    # makes every restart/resume and each later stage's shared programs
    # warm. jax.config.update (not the env var — jax may already be
    # imported); never on the CPU backend, whose cache entries embed host
    # machine code that goes stale across sessions (tests/conftest.py).
    import os

    import jax

    if (
        "JAX_COMPILATION_CACHE_DIR" not in os.environ
        and jax.default_backend() != "cpu"
    ):
        jax.config.update(
            "jax_compilation_cache_dir",
            str(Path(__file__).resolve().parents[2] / ".jax_cache"),
        )
    argv = sys.argv[1:] if argv is None else argv
    parser = argparse.ArgumentParser()
    parser.add_argument("--profiling", type=str, default=None)
    parser.add_argument("--trace", type=str, default=None)
    parser.add_argument("--auto-breakpoint", action="store_true")
    # Task.detach/join parity (engine/task.py:136-143): run the task in a
    # detached subprocess (log to --detach-log), or bound the run time
    parser.add_argument("--detach", action="store_true")
    parser.add_argument("--detach-log", type=str, default="task-detached.log")
    parser.add_argument("--join-timeout", type=float, default=None)
    subs = parser.add_subparsers(dest="command", required=True)
    for name, task in tasks.items():
        sp = subs.add_parser(name)
        _add_dataclass_args(sp, type(task))
    args = vars(parser.parse_args(argv))
    command = args.pop("command")
    profiling = args.pop("profiling")
    trace = args.pop("trace")
    auto_bp = args.pop("auto_breakpoint")
    detach = args.pop("detach")
    detach_log = args.pop("detach_log")
    join_timeout = args.pop("join_timeout")
    task = _apply_overrides(tasks[command], args)

    if detach:
        import subprocess

        child_argv = [a for a in argv if a != "--detach"]
        with open(detach_log, "ab") as log:
            proc = subprocess.Popen(
                [sys.executable, sys.argv[0]] + child_argv,
                stdout=log, stderr=log, start_new_session=True,
            )
        print(f"detached as pid {proc.pid} (log: {detach_log})")
        return proc.pid
    if join_timeout is not None:
        import subprocess

        drop = ("--join-timeout", str(join_timeout))
        child_argv = [
            a for i, a in enumerate(argv)
            if a not in drop and (i == 0 or argv[i - 1] != "--join-timeout")
        ]
        proc = subprocess.Popen([sys.executable, sys.argv[0]] + child_argv)
        try:
            return proc.wait(timeout=join_timeout)
        except subprocess.TimeoutExpired:
            proc.terminate()
            raise TimeoutError(
                f"task exceeded --join-timeout {join_timeout}s and was terminated"
            )

    def _run():
        if trace is not None:
            import jax

            with jax.profiler.trace(trace):
                return task.run()
        return task.run()

    try:
        if profiling is not None:
            import cProfile

            prof = cProfile.Profile()
            try:
                return prof.runcall(_run)
            finally:
                prof.dump_stats(profiling)
        return _run()
    except Exception:
        if auto_bp:
            import pdb
            import traceback

            traceback.print_exc()
            pdb.post_mortem()
        raise
