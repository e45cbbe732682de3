"""Hyperparameter search (reference yolo/utils/tuner.py:16-40 uses Ray Tune
ASHA; ray isn't available here, so the same search space drives a seeded
random search with early termination on fitness — `run_ray_tune` delegates
to Ray when it is importable).
"""
from __future__ import annotations

import random
from typing import Dict, Optional

from . import LOGGER

# Same space (and the same ALL-UNIFORM sampling) as the reference
# default_space, tuner.py:16-38 — log-sampling any key would make the
# builtin and ray paths search different distributions
SEARCH_SPACE = {
    "lr0": (1e-5, 1e-1),
    "lrf": (0.01, 1.0),
    "momentum": (0.6, 0.98),
    "weight_decay": (0.0, 0.001),
    "warmup_epochs": (0.0, 5.0),
    "warmup_momentum": (0.0, 0.95),
    "box": (0.02, 0.2),
    "cls": (0.2, 4.0),
    "hsv_h": (0.0, 0.1),
    "hsv_s": (0.0, 0.9),
    "hsv_v": (0.0, 0.9),
    "degrees": (0.0, 45.0),
    "translate": (0.0, 0.9),
    "scale": (0.0, 0.9),
    "shear": (0.0, 10.0),
    "perspective": (0.0, 0.001),
    "flipud": (0.0, 1.0),
    "fliplr": (0.0, 1.0),
    "mosaic": (0.0, 1.0),
    "mixup": (0.0, 1.0),
    "copy_paste": (0.0, 1.0),
}


def _sample(rng: random.Random, space: Optional[Dict] = None) -> Dict[str, float]:
    out = {}
    for k, bounds in (space or SEARCH_SPACE).items():
        lo, hi = bounds[0], bounds[1]
        out[k] = rng.uniform(lo, hi)
    return out


def run_tune(model, data: str = "synthetic", n_trials: int = 10,
             epochs_per_trial: int = 10, seed: int = 0,
             space: Optional[Dict] = None, **train_kwargs):
    """Random-search tuning loop; returns (best_cfg, best_fitness, history).

    `train_kwargs` may override data/epochs (they are merged, with explicit
    train_kwargs winning) — callers like run_ray_tune's fallback forward the
    user's train_args verbatim.
    """
    rng = random.Random(seed)
    best_cfg, best_fit = None, -1.0
    history = []
    base = {"data": data, "epochs": epochs_per_trial}
    base.update(train_kwargs)  # user train_args win over the defaults
    base.pop("name", None)     # per-trial run names are owned by the loop
    for t in range(n_trials):
        cfg = _sample(rng, space)
        head = ", ".join(f"{k}={v:.3g}" for k, v in list(cfg.items())[:3])
        LOGGER.info(f"tune trial {t + 1}/{n_trials}: {head} ...")
        try:
            metrics = model.train(name=f"tune_{t}", **cfg, **base)
            fit = float(metrics.get("fitness", metrics.get("top1", 0.0)))
        except Exception as e:
            LOGGER.warning(f"trial {t} failed: {e}")
            fit = -1.0
        history.append({"trial": t, "fitness": fit, **cfg})
        if fit > best_fit:
            best_fit, best_cfg = fit, cfg
    LOGGER.info(f"tune done: best fitness {best_fit:.4f}")
    return best_cfg, best_fit, history


def run_ray_tune(model, data: str = "synthetic", space: Optional[Dict] = None,
                 grace_period: int = 10, max_samples: int = 10,
                 train_args: Optional[Dict] = None, **kwargs):
    """Ray Tune ASHA search when ray is importable (reference YOLO.tune,
    engine/model.py:391-474); falls back to the built-in seeded random
    search otherwise (same space, same uniform sampling)."""
    try:
        from ray import tune
        from ray.air import RunConfig
        from ray.tune.schedulers import ASHAScheduler
    except ImportError:
        LOGGER.info("ray not installed; using built-in random search")
        # merge rather than splat alongside data= — train_args legitimately
        # carries data/epochs and a duplicate keyword would kill every trial
        ta = dict(train_args or {})
        ta.setdefault("data", data)
        return run_tune(model, n_trials=max_samples, space=space,
                        **ta, **kwargs)

    train_args = train_args or {}
    if space is None:
        space = {k: tune.uniform(lo, hi) for k, (lo, hi) in
                 SEARCH_SPACE.items()}
    space["data"] = data

    def _trainable(config):
        from ray.air import session

        from ..engine.model import TASK_MAP
        config = dict(config)
        config.update(train_args)
        overrides = {**model.overrides, **config, "mode": "train"}
        trainer = TASK_MAP[model.task][1](overrides=overrides,
                                          model=model.model)
        # per-epoch reporting so ASHA's grace_period/max_t actually gate
        # trials (a single end-of-run report would reduce ASHA to plain
        # random search at full cost per trial)
        trainer.add_callback(
            "on_fit_epoch_end",
            lambda tr: session.report(
                {"fitness": float(getattr(tr, "metrics", {}).get(
                    "fitness", 0.0)),
                 "epoch": int(getattr(tr, "epoch", 0)) + 1}))
        trainer.train()

    scheduler = ASHAScheduler(time_attr="epoch", metric="fitness",
                              mode="max",
                              max_t=train_args.get("epochs") or 100,
                              grace_period=grace_period, reduction_factor=3)
    tuner = tune.Tuner(
        _trainable, param_space=space,
        tune_config=tune.TuneConfig(scheduler=scheduler,
                                    num_samples=max_samples),
        run_config=RunConfig(local_dir="./runs"))
    tuner.fit()
    return tuner.get_results()
