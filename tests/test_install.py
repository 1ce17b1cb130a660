"""Packaging: `pip install` the repo (pyproject.toml) into a clean target and use
it from a foreign cwd — the reference ships an install story (setup.sh:1-20);
ours is `pip install -e .` + console scripts. No network: --no-deps
--no-build-isolation against the baked-in setuptools."""
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def installed(tmp_path_factory):
    target = str(tmp_path_factory.mktemp("site"))
    r = subprocess.run(
        [sys.executable, "-m", "pip", "install", "--quiet", "--no-deps",
         "--no-build-isolation", "--target", target, REPO],
        capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stderr[-2000:]
    return target


def _run_py(code, target, cwd):
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    env["PYTHONPATH"] = target
    return subprocess.run([sys.executable, "-c", code], capture_output=True,
                          text=True, env=env, cwd=cwd, timeout=600)


def test_import_from_installed_copy(installed, tmp_path):
    """Import + run a real flow from the installed copy with a foreign cwd
    (the repo-root-cwd requirement is gone once installed)."""
    code = """
import os, sys
import pantomatrix_tpu
assert os.path.realpath(pantomatrix_tpu.__file__).startswith(os.path.realpath(sys.argv[1] if len(sys.argv)>1 else os.environ['PYTHONPATH'])), pantomatrix_tpu.__file__
import jax
jax.config.update('jax_platforms', 'cpu')
import numpy as np
from pantomatrix_tpu.core.rotations import axis_angle_to_rotation_6d
from pantomatrix_tpu.models.configs import CamnAudioConfig
from pantomatrix_tpu.models.camn import camn_forward, init_camn
cfg = CamnAudioConfig(hidden_size=32, n_layer=1, dropout_prob=0.0)
params = init_camn(jax.random.PRNGKey(0), cfg)
out = camn_forward(params, cfg, np.zeros((1, 16*1080), np.float32),
                   np.zeros((1, 1), np.int32), cfg.seed_frames)
assert out['motion_axis_angle'].shape[0] == 1 and out['motion_axis_angle'].shape[2] == 165
print('ok')
"""
    r = _run_py(code, installed, str(tmp_path))
    assert r.returncode == 0, r.stderr[-2000:]
    assert "ok" in r.stdout


def test_configs_ship_with_package(installed):
    cfgdir = os.path.join(installed, "pantomatrix_tpu", "configs")
    got = sorted(os.listdir(cfgdir))
    assert {"camn_audio.yaml", "disco_audio.yaml", "emage_audio.yaml"} <= set(got)
    # native C++ sources ship too (compiled on demand, native/__init__.py)
    assert any(f.endswith(".cpp")
               for f in os.listdir(os.path.join(installed, "pantomatrix_tpu", "native")))


def test_console_entry_points_registered(installed):
    import configparser
    import glob

    dist = glob.glob(os.path.join(installed, "pantomatrix_tpu-*.dist-info",
                                  "entry_points.txt"))
    dist += glob.glob(os.path.join(installed, "pantomatrix_tpu*.dist-info",
                                   "entry_points.txt"))
    assert dist, os.listdir(installed)
    cp = configparser.ConfigParser()
    cp.read(dist[0])
    scripts = dict(cp["console_scripts"])
    for name in ("panto-test-emage", "panto-train-emage", "panto-serve",
                 "panto-evaluate"):
        assert name in scripts, sorted(scripts)


def test_cli_help_from_foreign_cwd(installed, tmp_path):
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    env["PYTHONPATH"] = installed
    # foreign-cwd runs don't register the axon plugin (CLAUDE.md); ask for the
    # CPU backend explicitly so the global JAX_PLATFORMS=axon doesn't apply
    env["JAX_PLATFORMS"] = "cpu"
    r = subprocess.run(
        [sys.executable, "-m", "pantomatrix_tpu.cli.train_camn", "--help"],
        capture_output=True, text=True, env=env, cwd=str(tmp_path), timeout=600)
    assert r.returncode == 0, r.stderr[-1500:]
    assert "--config" in r.stdout
