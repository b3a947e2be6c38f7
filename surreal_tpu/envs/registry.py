"""Environment registry + `make_env` dispatch.

Role of the reference's `make_env(env_config)` with name-prefix dispatch
("dm_control:cheetah-run" etc., SURVEY.md §2 env base row). Names accept
both "domain-task" and the reference-style "dm_control:domain-task" prefix.
"""

from __future__ import annotations

from typing import Callable

from surreal_tpu.envs.base import Environment

_REGISTRY: dict[str, Callable[..., Environment]] = {}


def register(name: str, factory: Callable[..., Environment]) -> None:
    _REGISTRY[name] = factory


def _builtin():
    from surreal_tpu.envs.cartpole import Cartpole
    from surreal_tpu.envs.cheetah import CheetahRun
    from surreal_tpu.envs.walker import Walker

    register("cartpole-balance", lambda **kw: Cartpole(swing_up=False, sparse=False, **kw))
    register(
        "cartpole-balance_sparse", lambda **kw: Cartpole(swing_up=False, sparse=True, **kw)
    )
    register("cartpole-swingup", lambda **kw: Cartpole(swing_up=True, sparse=False, **kw))
    register(
        "cartpole-swingup_sparse", lambda **kw: Cartpole(swing_up=True, sparse=True, **kw)
    )
    register(
        "cartpole-two_poles",
        lambda **kw: Cartpole(swing_up=True, sparse=False, n_poles=2, **kw),
    )
    register(
        "cartpole-three_poles",
        lambda **kw: Cartpole(swing_up=True, sparse=False, n_poles=3, **kw),
    )
    register("cheetah-run", lambda **kw: CheetahRun(**kw))
    from surreal_tpu.envs.classic import AcrobotSwingup, PendulumSwingup
    from surreal_tpu.envs.hopper import Hopper

    register("pendulum-swingup", lambda **kw: PendulumSwingup(**kw))
    register("acrobot-swingup", lambda **kw: AcrobotSwingup(sparse=False, **kw))
    register("acrobot-swingup_sparse", lambda **kw: AcrobotSwingup(sparse=True, **kw))
    register("hopper-stand", lambda **kw: Hopper(hopping=False, **kw))
    register("hopper-hop", lambda **kw: Hopper(hopping=True, **kw))
    from surreal_tpu.envs.reacher import Reacher

    register("reacher-easy", lambda **kw: Reacher(target_size=0.05, **kw))
    register("reacher-hard", lambda **kw: Reacher(target_size=0.015, **kw))
    register("walker-stand", lambda **kw: Walker(move_speed=0.0, **kw))
    register("walker-walk", lambda **kw: Walker(move_speed=1.0, **kw))
    register("walker-run", lambda **kw: Walker(move_speed=8.0, **kw))
    from surreal_tpu.envs.ball_in_cup import BallInCup
    from surreal_tpu.envs.finger import Finger
    from surreal_tpu.envs.pointmass import PointMass

    register("point_mass-easy", lambda **kw: PointMass(**kw))
    register("ball_in_cup-catch", lambda **kw: BallInCup(**kw))
    register("finger-spin", lambda **kw: Finger(task="spin", **kw))
    register("finger-turn_easy", lambda **kw: Finger(task="turn", target_radius=0.07, **kw))
    register("finger-turn_hard", lambda **kw: Finger(task="turn", target_radius=0.03, **kw))
    from surreal_tpu.envs.manipulator import Manipulator

    register("manipulator-bring_ball", lambda **kw: Manipulator(prop="ball", **kw))
    register("manipulator-bring_peg", lambda **kw: Manipulator(prop="peg", **kw))
    from surreal_tpu.envs.swimmer import Swimmer

    register("swimmer-swimmer6", lambda **kw: Swimmer(n_links=6, **kw))
    register("swimmer-swimmer15", lambda **kw: Swimmer(n_links=15, **kw))


def make_env(name: str, **kwargs) -> Environment:
    if not _REGISTRY:
        _builtin()
    if name.startswith("gym:"):
        # reference-style "gym:<env_id>" dispatch — host-loop adapter
        from surreal_tpu.envs.gym_adapter import GymEnv

        return GymEnv(name.split(":", 1)[1], **kwargs)
    key = name.split(":", 1)[-1]  # strip "dm_control:" style prefix
    if key not in _REGISTRY:
        raise KeyError(f"Unknown env {name!r}; available: {sorted(_REGISTRY)}")
    return _REGISTRY[key](**kwargs)


def available_envs() -> list[str]:
    if not _REGISTRY:
        _builtin()
    return sorted(_REGISTRY)
