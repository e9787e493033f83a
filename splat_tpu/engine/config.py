"""Config tree + dotted-path CLI overrides.

The reference's config surface is nerfstudio's tyro CLI: dotted-path overrides
like `--pipeline.model.blur-samples 10` plus a dataparser subcommand block
(`nerfstudio-data --eval-mode filename ...`) — SURVEY.md §5 "the config tree IS
the API". This module reimplements that contract on plain dataclasses (tyro is
not available here): kebab-case dotted paths map onto nested dataclass fields,
with bool/int/float/str coercion from the field's declared type.
"""
from __future__ import annotations

import dataclasses
import datetime
from pathlib import Path
from typing import Any, get_args, get_origin

from ..cameras import optimizers as cam_opt
from ..data.dataparser import DataParserConfig
from ..models.splatfacto import SplatfactoConfig
from ..parallel.sharding import MeshConfig
from .trainer import TrainerConfig


@dataclasses.dataclass
class RunConfig:
    """One training run (the ns-train invocation equivalent)."""

    data: str = ""
    output_dir: str = "data/outputs"
    experiment_name: str = "default"
    method_name: str = "splatfacto"
    timestamp: str = ""
    max_num_iterations: int = 20000
    steps_per_save: int = 5000
    # 0 = evaluate only at the end of training. Mid-run eval cadence is
    # opt-in (--steps-per-eval N): each eval costs ~45-60 s of wall over this
    # box's remote tunnel (render compile + per-image dispatches), which
    # dominates short benchmark runs.
    steps_per_eval: int = 0
    vis: str = "none"                 # none | viewer (live browser viewer) | tensorboard (tfevents scalar export) | viewer+tensorboard
    viewer_port: int = 7007
    seed: int = 42
    model: SplatfactoConfig = dataclasses.field(default_factory=SplatfactoConfig)
    trainer: TrainerConfig = dataclasses.field(default_factory=TrainerConfig)
    dataparser: DataParserConfig = dataclasses.field(
        default_factory=lambda: DataParserConfig(eval_mode="interval")
    )
    # multi-chip training mesh: --mesh.enabled True [--mesh.data/gauss/blur/tile N]
    # (0 = auto-fill from jax.device_count(); reference is single-GPU, §2d)
    mesh: MeshConfig = dataclasses.field(default_factory=MeshConfig)

    def run_dir(self) -> Path:
        ts = self.timestamp or datetime.datetime.now().strftime("%Y-%m-%d_%H%M%S")
        return Path(self.output_dir) / self.experiment_name / self.method_name / ts


def _coerce(value: str, ftype: Any):
    if ftype is bool or (get_origin(ftype) is None and ftype == bool):
        if value in ("True", "true", "1"):
            return True
        if value in ("False", "false", "0"):
            return False
        raise ValueError(f"bad bool {value!r}")
    if ftype is int:
        return int(value)
    if ftype is float:
        return float(value)
    if ftype is str:
        return value
    if get_origin(ftype) is tuple:
        # tile specs etc.: "16x8" or "16,8" -> (16, 8)
        parts = [p for p in value.replace("x", ",").split(",") if p]
        return tuple(int(p) for p in parts)
    # Optional / unions: try args in order
    for arg in get_args(ftype):
        if arg is type(None):
            continue
        try:
            return _coerce(value, arg)
        except (ValueError, TypeError):
            continue
    return value


def _field_types(cls) -> dict[str, Any]:
    # resolve string annotations (modules use `from __future__ import annotations`)
    import typing

    try:
        return typing.get_type_hints(cls)
    except Exception:
        return {f.name: f.type for f in dataclasses.fields(cls)}


def _set_dotted(obj: Any, path: list[str], value: str) -> Any:
    """Immutably set a kebab-case dotted path on nested (frozen) dataclasses."""
    name = path[0].replace("-", "_")
    if not dataclasses.is_dataclass(obj):
        raise AttributeError(f"cannot descend into {type(obj).__name__}")
    fields = {f.name: f for f in dataclasses.fields(obj)}
    if name not in fields:
        raise AttributeError(
            f"{type(obj).__name__} has no field {name!r} "
            f"(known: {sorted(fields)})"
        )
    cur = getattr(obj, name)
    if len(path) == 1:
        ftype = _field_types(type(obj)).get(name, str)
        new_val = _coerce(value, ftype) if isinstance(value, str) else value
        return dataclasses.replace(obj, **{name: new_val})
    return dataclasses.replace(obj, **{name: _set_dotted(cur, path[1:], value)})


# dotted-path roots: `--pipeline.model.*` -> model, matching the reference CLI.
_ROOT_ALIASES = {
    "pipeline.model": "model",
    "pipeline.datamanager": "dataparser",
    "model": "model",
    "trainer": "trainer",
    "optimizers": "trainer",
    "mesh": "mesh",
}


def help_text() -> str:
    """ns-train-style usage: every dataclass field is a dotted flag."""
    import io

    from ..data.dataparser import DataParserConfig
    from ..models.splatfacto import SplatfactoConfig
    from .trainer import TrainerConfig

    out = io.StringIO()
    out.write(
        "usage: fit.py [splatfacto] [--<run-field> V]... "
        "[--pipeline.model.<field> V]... [--trainer.<field> V]... "
        "[nerfstudio-data [--<dataparser-field> V]...]\n\n"
        "Flags are kebab- or snake-case dataclass fields; values are parsed "
        "to the field's type. Sections:\n"
    )
    for title, cls, prefix in (
        ("run", RunConfig, "--"),
        ("model", SplatfactoConfig, "--pipeline.model."),
        ("trainer", TrainerConfig, "--trainer."),
        ("mesh (multi-chip)", MeshConfig, "--mesh."),
        ("dataparser (after 'nerfstudio-data')", DataParserConfig, "--"),
    ):
        out.write(f"\n[{title}]\n")
        for f in dataclasses.fields(cls):
            if f.name in ("model", "trainer", "dataparser", "mesh"):
                continue
            default = getattr(cls(), f.name, None)
            if dataclasses.is_dataclass(default):
                default = "{...}"
            out.write(f"  {prefix}{f.name.replace('_', '-'):<38} (default: {default})\n")
    return out.getvalue()

# field-name aliases to keep the reference's exact flags working
_FIELD_ALIASES = {
    "camera-velocity-optimizer": "camera_velocity_optimizer",
    "camera-optimizer": "camera_optimizer",
    "zero-initial-velocities": "zero_initial_velocities",
}


def parse_cli(argv: list[str]) -> RunConfig:
    """Parse an ns-train-style command line into a RunConfig.

    Grammar (mirrors reference train.py:114-193):
      [splatfacto] --data D [--flag value]... [nerfstudio-data --eval-mode X ...]
    """
    cfg = RunConfig()
    i = 0
    section = "run"  # run | dataparser
    if argv and argv[0] == "splatfacto":
        i = 1
    while i < len(argv):
        tok = argv[i]
        if tok in ("--help", "-h"):
            print(help_text())
            raise SystemExit(0)
        if tok == "nerfstudio-data":
            section = "dataparser"
            i += 1
            continue
        if not tok.startswith("--"):
            raise ValueError(f"unexpected token {tok!r}")
        key = tok[2:]
        if i + 1 >= len(argv):
            raise ValueError(f"missing value for {tok}")
        value = argv[i + 1]
        i += 2

        if section == "dataparser":
            cfg = dataclasses.replace(
                cfg, dataparser=_set_dotted(cfg.dataparser, key.split("."), value)
            )
            continue

        # top-level run fields
        flat = key.replace("-", "_").replace(".", "_")
        run_fields = {f.name for f in dataclasses.fields(RunConfig)}
        if flat in run_fields and "." not in key:
            cfg = _set_dotted(cfg, [key], value)
            continue

        # dotted pipeline path
        parts = key.split(".")
        root = None
        for alias, target in _ROOT_ALIASES.items():
            alias_parts = alias.split(".")
            if parts[: len(alias_parts)] == alias_parts:
                root = target
                rest = parts[len(alias_parts):]
                break
        if root is None:
            raise ValueError(f"unknown flag {tok!r}")
        rest = [_FIELD_ALIASES.get(p, p) for p in rest]
        cfg = dataclasses.replace(
            cfg, **{root: _set_dotted(getattr(cfg, root), rest, value)}
        )
    return cfg


def save_config(cfg: RunConfig, path: Path) -> None:
    """Write the config manifest (config.yml-equivalent; JSON for no-deps)."""
    import json

    def enc(o):
        if dataclasses.is_dataclass(o):
            return {f.name: enc(getattr(o, f.name)) for f in dataclasses.fields(o)}
        return o

    path.write_text(json.dumps(enc(cfg), indent=2, default=str))


def load_config(path: Path) -> RunConfig:
    import json

    raw = json.loads(Path(path).read_text())

    def dec(cls, d):
        kw = {}
        for f in dataclasses.fields(cls):
            if f.name not in d:
                continue
            v = d[f.name]
            if dataclasses.is_dataclass(f.type) and isinstance(v, dict):
                kw[f.name] = dec(f.type, v)
            elif f.name == "model" and isinstance(v, dict):
                kw[f.name] = dec(SplatfactoConfig, v)
            elif f.name == "trainer" and isinstance(v, dict):
                kw[f.name] = dec(TrainerConfig, v)
            elif f.name == "dataparser" and isinstance(v, dict):
                kw[f.name] = dec(DataParserConfig, v)
            elif f.name == "mesh" and isinstance(v, dict):
                kw[f.name] = dec(MeshConfig, v)
            elif f.name == "camera_optimizer" and isinstance(v, dict):
                kw[f.name] = dec(cam_opt.CameraOptConfig, v)
            elif f.name == "camera_velocity_optimizer" and isinstance(v, dict):
                kw[f.name] = dec(cam_opt.VelocityOptConfig, v)
            elif isinstance(v, list) and "tuple" in str(f.type):
                kw[f.name] = tuple(v)   # json round-trips tuples as lists
            else:
                kw[f.name] = v
        return cls(**kw)

    return dec(RunConfig, raw)
