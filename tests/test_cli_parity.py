"""Automated CLI-parity check: every reference script's argparse surface
(flag names, aliases, defaults, types, actions, choices, required, nargs)
must be reproduced byte-for-byte by the same-named rebuilt script.

Reference side: extracted by AST walk over ``add_argument`` calls in
/root/reference (its torch/torch_mimicry imports are not installable
here). Rebuilt side: the LIVE parser, captured by running each script up
to its first ``parse_args`` (scripts/dump_argparse.py), so flags added by
helpers like cli/common.add_common_train_flags are covered.

Additive flags (TPU-native features absent from the reference) are
allowlisted per script below and must be documented in docs/MIGRATION.md.
Reference surface inventory: SURVEY.md §2.9.
"""
from __future__ import annotations

import ast
import json
import subprocess
import sys
from pathlib import Path

import pytest

ROOT = Path(__file__).resolve().parents[1]
REF = Path("/root/reference")

SCRIPTS = [
    "train_mimicry_phase1.py",
    "train_mimicry_phase2.py",
    "train_mimicry_color_mnist_phase1.py",
    "train_mimicry_color_mnist_phase2.py",
    "train_mimicry_color_mnist_phase2_gold.py",
    "train_mimicry_mnist_fmnist_phase1.py",
    "train_mimicry_mnist_fmnist_phase2.py",
    "train_mimicry_mnist_fmnist_phase2_gold.py",
    "train_mimicry_inclusive.py",
    "train_cae.py",
    "train_cae_inclusive.py",
    "eval_ae_score.py",
    "eval_gan.py",
    "eval_gan_drs.py",
    "eval_gan_with_index.py",
    "eval_gan_drs_with_index.py",
    "eval_gan_celeba_with_attr.py",
    "eval_gan_drs_celeba_with_attr.py",
    "train_convnet_celeba.py",
    "count_attr_celeba.py",
    "disc_score_celeba_with_attr.py",
    "train_color_mnist_feature.py",
    "train_mnist_fmnist_feature.py",
    "stylegan2/train_ffhq.py",
    "stylegan2/train_ffhq_phase2.py",
    "stylegan2/generate.py",
    "stylegan2/prepare_data.py",
]

# Flags that exist only in the rebuild — each is an additive TPU-native
# feature documented in docs/MIGRATION.md (and PARITY.md for behavior
# deviations). Anything not listed here fails the test.
COMMON_TRAIN_ADDITIVE = {
    "--simultaneous_g", "--auto_resume", "--bf16", "--data_parallel",
}
MIMICRY_TRAIN_ADDITIVE = COMMON_TRAIN_ADDITIVE | {"--no_schedule_override"}
PHASE2_ADDITIVE = MIMICRY_TRAIN_ADDITIVE | {"--normalize_logits"}
STYLEGAN2_ADDITIVE = {
    "--bf16", "--remat", "--no_fuse", "--stream_data", "--data_parallel",
    "--save_every", "--auto_resume", "--ada_pad_frac", "--max_chunk",
}
ADDITIVE = {
    "train_mimicry_phase1.py": MIMICRY_TRAIN_ADDITIVE,
    "train_mimicry_phase2.py": PHASE2_ADDITIVE,
    "train_mimicry_color_mnist_phase1.py": MIMICRY_TRAIN_ADDITIVE,
    "train_mimicry_color_mnist_phase2.py": PHASE2_ADDITIVE,
    "train_mimicry_color_mnist_phase2_gold.py": MIMICRY_TRAIN_ADDITIVE,
    "train_mimicry_mnist_fmnist_phase1.py": MIMICRY_TRAIN_ADDITIVE,
    "train_mimicry_mnist_fmnist_phase2.py": PHASE2_ADDITIVE,
    "train_mimicry_mnist_fmnist_phase2_gold.py": MIMICRY_TRAIN_ADDITIVE,
    "train_mimicry_inclusive.py": MIMICRY_TRAIN_ADDITIVE,
    "stylegan2/train_ffhq.py": STYLEGAN2_ADDITIVE,
    "stylegan2/train_ffhq_phase2.py": STYLEGAN2_ADDITIVE | {
        "--normalize_logits", "--stop_save_logit_after"},
    "stylegan2/generate.py": {"--bf16", "--out_dir", "--seed"},
    "eval_gan_celeba_with_attr.py": {
        "--metric", "--num_real_samples", "--num_fake_samples"},
    "eval_gan_drs_celeba_with_attr.py": {
        "--metric", "--num_real_samples", "--num_fake_samples"},
    "eval_gan_with_index.py": {"--root"},
    "eval_gan_drs_with_index.py": {"--root"},
    "train_convnet_celeba.py": {"--root", "--work_dir"},
}

# (script, flag) -> field -> (ref_value, ours_value): intentional,
# documented surface deviations. Empty = full parity is enforced.
DEVIATIONS: dict = {}


def _safe_eval(node):
    """Evaluate a default-value expression with no names/builtins
    (literals and arithmetic like 500 * 1000); fall back to source."""
    try:
        return eval(  # noqa: S307 - empty env, reference ASTs only
            compile(ast.Expression(node), "<ref>", "eval"),
            {"__builtins__": {}}, {},
        )
    except Exception:
        return f"<expr:{ast.unparse(node)}>"


def _kw(call: ast.Call, name: str):
    for k in call.keywords:
        if k.arg == name:
            return k.value
    return None


def extract_ref_surface(path: Path) -> dict:
    """AST-extract every parser.add_argument(...) in the file."""
    tree = ast.parse(path.read_text())
    out = {}
    for node in ast.walk(tree):
        if not (isinstance(node, ast.Call)
                and isinstance(node.func, ast.Attribute)
                and node.func.attr == "add_argument"):
            continue
        opts = [a.value for a in node.args
                if isinstance(a, ast.Constant) and isinstance(a.value, str)]
        longs = [o for o in opts if o.startswith("--")]
        flags = [o for o in opts if o.startswith("-")]
        key = longs[0] if longs else (opts[0] if opts else "?")
        action_node = _kw(node, "action")
        action = (action_node.value
                  if isinstance(action_node, ast.Constant) else "store")
        type_node = _kw(node, "type")
        type_name = None
        if isinstance(type_node, ast.Name):
            type_name = type_node.id
        elif type_node is not None:
            type_name = ast.unparse(type_node)
        default_node = _kw(node, "default")
        if default_node is not None:
            default = _safe_eval(default_node)
        else:
            default = False if action in ("store_true",) else (
                True if action == "store_false" else None)
        choices_node = _kw(node, "choices")
        choices = (sorted(_safe_eval(choices_node))
                   if choices_node is not None else None)
        required_node = _kw(node, "required")
        required = bool(required_node is not None
                        and getattr(required_node, "value", False))
        nargs_node = _kw(node, "nargs")
        nargs = _safe_eval(nargs_node) if nargs_node is not None else None
        out[key] = {
            "opts": sorted(flags), "default": default, "type": type_name,
            "action": action, "choices": choices, "required": required,
            "nargs": nargs,
        }
    return out


@pytest.fixture(scope="session")
def ours_surfaces(tmp_path_factory):
    """Capture all rebuilt scripts' live parsers in ONE subprocess."""
    out = tmp_path_factory.mktemp("cli") / "ours.json"
    subprocess.run(
        [sys.executable, str(ROOT / "scripts/dump_argparse.py"), str(out)]
        + [str(ROOT / s) for s in SCRIPTS],
        check=True, cwd=ROOT, timeout=600,
    )
    data = json.loads(out.read_text())
    return {Path(k).resolve().relative_to(ROOT).as_posix(): v
            for k, v in data.items()}


needs_ref = pytest.mark.skipif(
    not REF.is_dir(), reason="reference checkout not present")


@needs_ref
@pytest.mark.parametrize("script", SCRIPTS)
def test_cli_surface_matches_reference(script, ours_surfaces):
    ref = extract_ref_surface(REF / script)
    ours = ours_surfaces[script]
    assert "__error__" not in ours, ours.get("__error__")

    problems = []
    allow = ADDITIVE.get(script, set())
    for flag, rspec in ref.items():
        if flag not in ours:
            problems.append(f"missing reference flag {flag}")
            continue
        ospec = ours[flag]
        for field in ("opts", "default", "type", "action", "choices",
                      "required", "nargs"):
            rv, ov = rspec[field], ospec[field]
            if field == "action" and {rv, ov} == {"store", "store_true"}:
                # argparse represents both identically at runtime only
                # when defaults/type also agree — handled by those fields
                pass
            dev = DEVIATIONS.get((script, flag), {})
            if field in dev:
                exp_r, exp_o = dev[field]
                if (rv, ov) != (exp_r, exp_o):
                    problems.append(
                        f"{flag}.{field}: deviation drifted "
                        f"(ref={rv!r} ours={ov!r}, pinned {exp_r!r}/{exp_o!r})")
                continue
            if rv != ov:
                problems.append(f"{flag}.{field}: ref={rv!r} ours={ov!r}")
    for flag in ours:
        if flag not in ref and flag not in allow:
            problems.append(f"undocumented additive flag {flag}")
    assert not problems, f"{script}:\n  " + "\n  ".join(problems)


@needs_ref
def test_additive_flags_are_documented():
    """Every allowlisted additive flag must appear in docs/MIGRATION.md."""
    doc = (ROOT / "docs/MIGRATION.md").read_text()
    missing = sorted({
        f for flags in ADDITIVE.values() for f in flags if f not in doc
    })
    assert not missing, f"additive flags not documented: {missing}"
