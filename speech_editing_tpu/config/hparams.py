"""YAML-driven experiment configuration.

Re-creates the config surface of the reference toolkit
(``utils/commons/hparams.py:25-131`` in Zain-Jiang/Speech-Editing-Toolkit):
``--config/--exp_name/--hparams/--infer/--validate/--reset`` CLI flags,
recursive ``base_config`` YAML inheritance with a cycle guard, merging with a
saved ``checkpoints/<exp>/config.yaml``, dotted-path CLI overrides, and
persisting the resolved config into the work dir.

TPU-first design difference: the resolved config is an *immutable*
:class:`HParams` mapping that is passed explicitly to model/task constructors
instead of a global mutable dict — jitted train steps close over plain values,
so config reads never become traced side channels. A module-level ``hparams``
handle is still provided for CLI convenience.
"""

from __future__ import annotations

import argparse
import json
import os
import re
from collections.abc import Mapping
from typing import Any

import yaml


class HParams(Mapping):
    """Immutable, hashable-by-identity view over a nested config dict."""

    def __init__(self, data: dict[str, Any] | None = None, **kw):
        d = dict(data or {})
        d.update(kw)
        object.__setattr__(self, "_data", d)

    # Mapping protocol -----------------------------------------------------
    def __getitem__(self, k):
        return self._data[k]

    def __iter__(self):
        return iter(self._data)

    def __len__(self):
        return len(self._data)

    def __contains__(self, k):
        return k in self._data

    def get(self, k, default=None):
        return self._data.get(k, default)

    # Mapping sets __hash__ = None; restore the documented identity hash
    __hash__ = object.__hash__

    def __reduce__(self):
        # plain-dict pickling: keeps spawn-context pools / deepcopy working
        return (self.__class__, (dict(self._data),))

    # attribute sugar ------------------------------------------------------
    def __getattr__(self, k):
        if k == "_data":
            # only reachable when _data is absent (mid-unpickle attribute
            # probes) — must not fall through to self._data again
            raise AttributeError(k)
        try:
            return self._data[k]
        except KeyError as e:  # pragma: no cover
            raise AttributeError(k) from e

    def __setattr__(self, k, v):
        raise TypeError("HParams is immutable; use .replace(**updates)")

    def replace(self, **updates) -> "HParams":
        d = dict(self._data)
        d.update(updates)
        return HParams(d)

    def to_dict(self) -> dict[str, Any]:
        return dict(self._data)

    def __repr__(self):
        return f"HParams({json.dumps(self._data, indent=1, sort_keys=True, default=str)[:2000]})"


# Module-level handle, populated by set_hparams() for CLI entry points only.
hparams: dict[str, Any] = {}


def _coerce(v: str) -> Any:
    """Parse a CLI override value string into a Python value."""
    v = v.strip()
    if v.lower() in ("true", "false"):
        return v.lower() == "true"
    if v.lower() in ("none", "null"):
        return None
    if re.fullmatch(r"[+-]?\d+", v):
        return int(v)
    try:
        return float(v)
    except ValueError:
        pass
    if v.startswith("[") and v.endswith("]"):
        inner = v[1:-1].strip()
        if not inner:
            return []
        parts = re.split(r"[,\s]+", inner)
        return [_coerce(p) for p in parts if p]
    return v


def _set_dotted(cfg: dict, key: str, value: Any):
    parts = key.split(".")
    node = cfg
    for p in parts[:-1]:
        node = node.setdefault(p, {})
    node[parts[-1]] = value


def _deep_update(dst: dict, src: Mapping) -> dict:
    for k, v in src.items():
        if isinstance(v, Mapping) and isinstance(dst.get(k), dict):
            _deep_update(dst[k], v)
        else:
            dst[k] = v
    return dst


def load_config(config_fn: str, _seen: set[str] | None = None) -> dict:
    """Load a YAML config, recursively resolving ``base_config`` inheritance.

    Mirrors the reference semantics (``hparams.py:51-72``): base configs are
    applied depth-first in listed order, derived keys win, cycles are ignored.
    Relative base paths resolve against the current working directory first,
    then against the directory of the including file.
    """
    _seen = _seen if _seen is not None else set()
    config_fn = os.path.abspath(config_fn)
    if config_fn in _seen:
        return {}
    _seen.add(config_fn)
    with open(config_fn) as f:
        cfg = yaml.safe_load(f) or {}
    bases = cfg.pop("base_config", [])
    if isinstance(bases, str):
        bases = [bases]
    merged: dict = {}
    for base in bases:
        cand = base
        if not os.path.isabs(cand) and not os.path.exists(cand):
            cand = os.path.join(os.path.dirname(config_fn), base)
        _deep_update(merged, load_config(cand, _seen))
    _deep_update(merged, cfg)
    return merged


def apply_overrides(cfg: dict, hparams_str: str) -> dict:
    """Apply ``-hp a.b=c,d=[1 2 3]`` style dotted overrides in place."""
    if not hparams_str:
        return cfg
    # split on commas that are not inside brackets
    items, depth, cur = [], 0, ""
    for ch in hparams_str:
        if ch == "[":
            depth += 1
        elif ch == "]":
            depth -= 1
        if ch == "," and depth == 0:
            items.append(cur)
            cur = ""
        else:
            cur += ch
    if cur:
        items.append(cur)
    for item in items:
        item = item.strip()
        if not item:
            continue
        k, v = item.split("=", 1)
        _set_dotted(cfg, k.strip(), _coerce(v))
    return cfg


def set_hparams(
    config: str = "",
    exp_name: str = "",
    hparams_str: str = "",
    print_hparams: bool = True,
    global_hparams: bool = True,
    argv: list[str] | None = None,
) -> HParams:
    """Resolve the experiment config exactly like the reference CLI.

    Precedence (low→high): base_config chain < config file < saved work-dir
    config (unless ``--reset``) < ``--hparams`` overrides.
    """
    if config == "" and argv is None:
        import sys

        argv = sys.argv[1:]
    parser = argparse.ArgumentParser(description="speech-editing-tpu")
    parser.add_argument("--config", type=str, default=config)
    parser.add_argument("--exp_name", type=str, default=exp_name)
    parser.add_argument("-hp", "--hparams", type=str, default=hparams_str)
    parser.add_argument("--infer", action="store_true")
    parser.add_argument("--validate", action="store_true")
    parser.add_argument("--reset", action="store_true")
    parser.add_argument("--remove", action="store_true")
    parser.add_argument("--debug", action="store_true")
    args, _ = parser.parse_known_args(argv if argv is not None else [])
    if config:
        args.config = config
    if exp_name:
        args.exp_name = exp_name
    if hparams_str:
        args.hparams = hparams_str

    cfg: dict = {}
    if args.config:
        cfg = load_config(args.config)

    work_dir = ""
    if args.exp_name:
        work_dir = os.path.join(cfg.get("work_dir_root", "checkpoints"), args.exp_name)
        if args.remove and os.path.exists(work_dir):
            # reference --remove: wipe the experiment dir before starting
            import shutil

            print(f"| removing work dir {work_dir}")
            shutil.rmtree(work_dir)
        saved_cfg_fn = os.path.join(work_dir, "config.yaml")
        if os.path.exists(saved_cfg_fn) and not args.reset:
            with open(saved_cfg_fn) as f:
                saved = yaml.safe_load(f) or {}
            _deep_update(cfg, saved)

    apply_overrides(cfg, args.hparams)
    cfg["work_dir"] = work_dir
    cfg["exp_name"] = args.exp_name
    cfg["infer"] = bool(args.infer or cfg.get("infer", False))
    cfg["validate"] = bool(args.validate)
    cfg["debug"] = bool(args.debug or cfg.get("debug", False))

    if work_dir and not cfg["infer"]:
        os.makedirs(work_dir, exist_ok=True)
        saved_cfg_fn = os.path.join(work_dir, "config.yaml")
        if args.reset or not os.path.exists(saved_cfg_fn):
            with open(saved_cfg_fn, "w") as f:
                yaml.safe_dump({k: v for k, v in cfg.items()}, f, sort_keys=True)

    hp = HParams(cfg)
    if global_hparams:
        hparams.clear()
        hparams.update(cfg)
    if print_hparams:
        print("| Hparams: ")
        for k in sorted(cfg):
            print(f"|   {k}: {cfg[k]}")
    return hp
