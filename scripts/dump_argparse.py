"""Dump the live argparse surface of CLI scripts as JSON.

Runs each script under ``runpy`` with ``ArgumentParser.parse_args``
monkeypatched to capture the parser and abort before any real work, then
serializes every action (option strings, default, type, action kind,
choices, required, nargs). One process handles all scripts so the heavy
imports (jax & co.) are paid once.

Used by tests/test_cli_parity.py to diff the rebuilt scripts'
flag surface against the reference's (extracted by AST there, since the
reference's torch/mimicry imports are not installable in this container).

Usage: python scripts/dump_argparse.py out.json script1.py script2.py ...
"""
from __future__ import annotations

import argparse
import json
import runpy
import sys
from pathlib import Path

_ACTION_KIND = {
    "_StoreAction": "store",
    "_StoreTrueAction": "store_true",
    "_StoreFalseAction": "store_false",
    "_StoreConstAction": "store_const",
    "_AppendAction": "append",
    "_CountAction": "count",
    "BooleanOptionalAction": "boolean_optional",
}


class _Captured(Exception):
    def __init__(self, parser):
        self.parser = parser


def _type_name(t):
    if t is None:
        return None
    return getattr(t, "__name__", str(t))


def serialize_parser(parser: argparse.ArgumentParser) -> dict:
    out = {}
    for a in parser._actions:
        if a.dest == "help":
            continue
        longs = [o for o in a.option_strings if o.startswith("--")]
        key = longs[0] if longs else (
            a.option_strings[0] if a.option_strings else a.dest
        )
        out[key] = {
            "opts": sorted(a.option_strings),
            "default": a.default,
            "type": _type_name(a.type),
            "action": _ACTION_KIND.get(type(a).__name__, type(a).__name__),
            "choices": sorted(a.choices) if a.choices else None,
            "required": bool(a.required),
            # store_true/false/const report nargs=0 at runtime; the AST
            # side (no explicit nargs) sees None — normalize
            "nargs": None if a.nargs == 0 else a.nargs,
        }
    return out


def capture_script(path: str) -> dict:
    """Run `path` as __main__ until its first parse_args; return surface."""
    real_parse = argparse.ArgumentParser.parse_args
    real_parse_known = argparse.ArgumentParser.parse_known_args

    def trap(self, *a, **k):
        raise _Captured(self)

    argparse.ArgumentParser.parse_args = trap
    argparse.ArgumentParser.parse_known_args = trap
    old_argv = sys.argv
    sys.argv = [path]
    # mimic `python <path>` from the repo root: script dir + cwd on sys.path
    for p in (str(Path(path).resolve().parent), str(Path.cwd())):
        if p not in sys.path:
            sys.path.insert(0, p)
    try:
        runpy.run_path(path, run_name="__main__")
    except _Captured as c:
        return serialize_parser(c.parser)
    finally:
        argparse.ArgumentParser.parse_args = real_parse
        argparse.ArgumentParser.parse_known_args = real_parse_known
        sys.argv = old_argv
    raise RuntimeError(f"{path}: script never called parse_args")


def main():
    out_path, scripts = sys.argv[1], sys.argv[2:]
    result = {}
    for s in scripts:
        try:
            result[s] = capture_script(s)
        except Exception as e:  # surface the failure per-script
            result[s] = {"__error__": f"{type(e).__name__}: {e}"}
    Path(out_path).write_text(json.dumps(result, indent=1, default=repr))


if __name__ == "__main__":
    main()
