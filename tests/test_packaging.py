"""Installed-distribution behavior: console entry points must resolve
everything inside the package (no repo checkout), since pyproject only
packages ``multimodal_mtrssm_tpu*`` (+ its configs/ package-data)."""

import shutil
import subprocess
import sys
from pathlib import Path

REPO_ROOT = Path(__file__).resolve().parent.parent


def test_cli_resolves_inside_package_copy(tmp_path):
    """Simulate site-packages: copy ONLY the package directory elsewhere and
    check the CLI's default-config resolution and imports work from there."""
    site = tmp_path / "site"
    site.mkdir()
    shutil.copytree(REPO_ROOT / "multimodal_mtrssm_tpu", site / "multimodal_mtrssm_tpu")
    code = (
        "from multimodal_mtrssm_tpu.train.entry import default_config_path\n"
        "import multimodal_mtrssm_tpu.cli as cli\n"
        "import multimodal_mtrssm_tpu.evaluation.cli as ecli\n"
        "import multimodal_mtrssm_tpu.server as server\n"
        "for n in ('mopoe_mrssm.yaml', 'mopoe_mmtrssm.yaml'):\n"
        "    p = default_config_path(n)\n"
        "    assert p.exists(), p\n"
        "    assert str(p).startswith(str(__import__('multimodal_mtrssm_tpu').__path__[0])), p\n"
        "print('PACKAGED_OK')\n"
    )
    env = {"PYTHONPATH": str(site), "PATH": "/usr/bin:/bin", "HOME": "/root",
           "JAX_PLATFORMS": "cpu"}
    proc = subprocess.run([sys.executable, "-c", code], env=env,
                          cwd=tmp_path, capture_output=True, text=True, timeout=300)
    assert proc.returncode == 0, proc.stdout + proc.stderr
    assert "PACKAGED_OK" in proc.stdout


def test_packaged_configs_match_repo_symlinks():
    """Repo-root configs/ are symlinks into the package — one canonical copy."""
    for name in ("mopoe_mrssm.yaml", "mopoe_mmtrssm.yaml", "mopoe_mrssm_crossmodal.yaml"):
        link = REPO_ROOT / "configs" / name
        target = REPO_ROOT / "multimodal_mtrssm_tpu" / "configs" / name
        assert target.is_file()
        assert link.resolve() == target.resolve()
