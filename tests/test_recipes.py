"""Per-task recipe registry: shipped defaults must match recorded evidence.

VERDICT r4 item 2: the winning hyperparameters lived only in
tools/jobs_r4*.json; the reference ships them as CLI defaults
(ppo_configs.py/ddpg_configs.py). These tests pin the envs/recipes.py
registry to the committed results/ artifacts: every recipe's evidence file
must exist, its header command line must encode exactly the recipe's
hyperparameters, and its recorded EVAL mean must match the registry.
"""

import json
import os

import pytest

from surreal_tpu.cli.configs import generate_configs
from surreal_tpu.envs.recipes import RECIPES, get_recipe
from surreal_tpu.envs.registry import available_envs

ROOT = os.path.join(os.path.dirname(__file__), "..")


def test_recipe_envs_are_registered():
    envs = set(available_envs())
    for (env, algo, pixel) in RECIPES:
        assert env in envs, f"recipe for unregistered env {env!r}"
        assert algo in ("ppo", "ddpg")


def test_recipe_applies_through_generate_configs():
    learner, env, session = generate_configs(
        "ppo", {"env": {"env_name": "walker-stand"}})
    assert learner.horizon == 256
    assert learner.num_minibatches == 16
    assert learner.entropy_coef == 0.005
    assert env.num_envs == 128
    assert session.total_env_steps == 40_000_000


def test_user_override_beats_recipe():
    learner, env, _ = generate_configs(
        "ppo", {"env": {"env_name": "walker-stand", "num_envs": 64},
                "learner": {"horizon": 32}})
    assert learner.horizon == 32  # user wins
    assert env.num_envs == 64
    assert learner.num_minibatches == 16  # rest of the recipe still applies


def test_use_recipe_false_gives_base():
    learner, env, session = generate_configs(
        "ppo", {"env": {"env_name": "walker-stand"},
                "session": {"use_recipe": False}})
    assert learner.horizon == 128
    assert env.num_envs == 256
    assert session.total_env_steps == 5_000_000


def test_pixel_recipe_selected_by_pixel_obs():
    learner, env, _ = generate_configs(
        "ppo", {"env": {"env_name": "cheetah-run", "pixel_obs": True}})
    assert learner.lr == 1e-4
    assert env.num_envs == 128
    learner_state, _, _ = generate_configs(
        "ppo", {"env": {"env_name": "cheetah-run"}})
    assert learner_state.lr == 3e-4  # state recipe is the defaults


def _parse_header(cmd: str):
    """tools/run_training.py command line -> {flag: value} (flags w/o dashes)."""
    toks = cmd.replace("# ", "").split()
    out, sets, i = {}, {}, 0
    while i < len(toks):
        t = toks[i]
        if t == "--set":
            k, v = toks[i + 1].split("=", 1)
            sets[k] = v
            i += 2
        elif t == "--pixel" or t == "--lstm" or t == "--overlap" or t == "--cpu":
            out[t[2:]] = True
            i += 1
        elif t.startswith("--"):
            out[t[2:]] = toks[i + 1]
            i += 2
        else:
            i += 1
    return out, sets


def _num(x):
    return int(float(str(x).replace("_", "")))


# Maps a header flag to the (section, key) it sets, with defaults equal to
# the base config (verified by test_header_defaults_match_base below).
_FLAG_TO_CFG = {
    "num-envs": ("env", "num_envs"),
    "horizon": ("learner", "horizon"),
    "minibatches": ("learner", "num_minibatches"),
    "entropy": ("learner", "entropy_coef"),
    "lr": ("learner", "lr"),
}


@pytest.mark.parametrize("key", sorted(RECIPES), ids=lambda k: f"{k[0]}-{k[1]}{'-px' if k[2] else ''}")
def test_recipe_matches_evidence(key):
    env_name, algo, pixel = key
    rec = RECIPES[key]
    path = os.path.join(ROOT, rec.evidence)
    if rec.eval_mean is None:
        pytest.skip(f"evidence run pending: {rec.evidence}")
    assert os.path.exists(path), f"missing evidence {rec.evidence}"
    with open(path) as f:
        lines = f.read().splitlines()
    header, sets = _parse_header(lines[0])

    # the evidence ran the same env/algo/pixel mode
    assert header["env"].split(":")[-1] == env_name
    assert header.get("algo", "ppo") == algo
    assert bool(header.get("pixel", False)) == pixel

    # shipped defaults == the command that produced the evidence
    learner, env, session = generate_configs(
        algo, {"env": {"env_name": env_name, "pixel_obs": pixel}})
    assert session.total_env_steps == _num(header["steps"]), "steps budget"
    for flag, (sec, k) in _FLAG_TO_CFG.items():
        if flag in header and (algo == "ppo" or flag == "num-envs"):
            got = {"env": env, "learner": learner}[sec][k]
            assert float(got) == float(header[flag]), f"{flag}: {got} != {header[flag]}"
    if "hidden" in header and algo == "ppo":
        assert list(learner.hidden) == [
            int(x) for x in header["hidden"].split(",")], "hidden"
    for k, v in sets.items():
        want = {"true": True, "false": False}.get(v.lower(), v)
        got = learner[k]
        if isinstance(want, str):
            assert float(got) == float(want), f"--set {k}"
        else:
            assert got == want, f"--set {k}"
    if "action-repeat" in header and pixel:
        assert env.pixel.action_repeat == _num(header["action-repeat"])

    # recorded eval matches the registry
    evals = [ln for ln in lines if ln.startswith("EVAL ")]
    assert evals, f"no EVAL in {rec.evidence}"
    mean = json.loads(evals[-1][5:])["return_mean"]
    assert abs(mean - rec.eval_mean) < 0.5, (
        f"registry says {rec.eval_mean}, evidence says {mean:.1f}")


def test_header_defaults_match_base():
    """The header-vs-recipe check above relies on run_training.py's argparse
    defaults equalling the base configs for every flag it omits."""
    learner, env, session = generate_configs(
        "ppo", {"env": {"env_name": "cheetah-run"},
                "session": {"use_recipe": False}})
    assert env.num_envs == 256  # --num-envs default
    assert learner.horizon == 128
    assert learner.num_minibatches == 8
    assert learner.lr == 3e-4
    assert learner.entropy_coef == 0.0


def test_get_recipe_prefix_and_missing():
    assert get_recipe("dm_control:cheetah-run", "ppo") is RECIPES[("cheetah-run", "ppo", False)]
    assert get_recipe("no-such-env", "ppo") is None
    assert get_recipe(None, "ppo") is None
