"""CLI surface smoke: every reference-named script must import and expose
its argparse surface (catches bitrot without running training)."""
import subprocess
import sys
from pathlib import Path

import pytest

ROOT = Path(__file__).resolve().parents[1]

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


def test_all_reference_scripts_exist():
    for s in SCRIPTS:
        assert (ROOT / s).is_file(), s


@pytest.mark.parametrize("script", SCRIPTS)
def test_script_compiles(script):
    """py_compile catches syntax/import-structure errors cheaply."""
    subprocess.run(
        [sys.executable, "-m", "py_compile", str(ROOT / script)], check=True
    )


@pytest.mark.parametrize(
    "script",
    ["train_mimicry_phase1.py", "train_mimicry_phase2.py", "eval_gan.py",
     "eval_gan_drs.py", "train_cae.py", "stylegan2/train_ffhq.py"],
)
def test_script_help(script):
    """--help must work (full import chain + argparse wiring)."""
    out = subprocess.run(
        [sys.executable, str(ROOT / script), "--help"],
        capture_output=True, text=True, timeout=300, cwd=ROOT,
    )
    assert out.returncode == 0, out.stderr[-800:]
    assert "--" in out.stdout
