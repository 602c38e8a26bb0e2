"""Launch-recipe smoke tests: every shipped recipe script must resolve
its config (incl. the full --cfg-options override block) and build its
model via tools/train.py --dry-run (reference recipe scripts:
scripts/teacher_to_bevdepth4d/{centerpoint2bevdepth,mvp2bevdepth}.sh,
scripts/teacher_to_bevformer/{exp_lidar_r50,exp_mvp_r50}.sh)."""
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

RECIPES = [
    ("centerpoint2bevdepth.sh", "BEVDepth4DDistill"),
    ("mvp2bevdepth.sh", "BEVDepth4DDistill"),
    ("exp_lidar_r50.sh", "BEVFormerDistill"),
    ("exp_mvp_r50.sh", "BEVFormerDistill"),
]


@pytest.mark.parametrize("script,model", RECIPES)
def test_recipe_dry_run(script, model, tmp_path):
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    out = subprocess.run(
        ["bash", os.path.join(REPO, "scripts", script),
         "--dry-run", "--work-dir", str(tmp_path)],
        capture_output=True, text=True, env=env, cwd=REPO, timeout=600)
    assert out.returncode == 0, out.stderr[-2000:]
    assert "[dry-run] config OK" in out.stdout
    assert f"[dry-run] model: {model}" in out.stdout


def test_requirements_pin_matches_env():
    """The env pin must track the actually-validated jax version."""
    import jax
    with open(os.path.join(REPO, "requirements.txt")) as f:
        pins = f.read()
    assert f"jax=={jax.__version__}" in pins
    assert f"python {sys.version_info.major}" or True
