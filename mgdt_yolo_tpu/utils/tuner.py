"""Hyperparameter search (reference yolo/utils/tuner.py:16-40 uses Ray Tune
ASHA; ray isn't available here, so the same search space drives a seeded
random search with early termination on fitness — `run_ray_tune` delegates
to Ray when it is importable).
"""
from __future__ import annotations

import random
from typing import Dict, Optional

from . import LOGGER

# Same space as the reference tuner.py:16-40
SEARCH_SPACE = {
    "lr0": (1e-5, 1e-1, "log"),
    "lrf": (0.01, 1.0, "log"),
    "momentum": (0.6, 0.98, "uniform"),
    "weight_decay": (0.0, 0.001, "uniform"),
    "warmup_epochs": (0.0, 5.0, "uniform"),
    "warmup_momentum": (0.0, 0.95, "uniform"),
    "box": (0.02, 0.2, "log"),
    "cls": (0.2, 4.0, "log"),
    "hsv_h": (0.0, 0.1, "uniform"),
    "hsv_s": (0.0, 0.9, "uniform"),
    "hsv_v": (0.0, 0.9, "uniform"),
    "degrees": (0.0, 45.0, "uniform"),
    "translate": (0.0, 0.9, "uniform"),
    "scale": (0.0, 0.9, "uniform"),
    "shear": (0.0, 10.0, "uniform"),
    "perspective": (0.0, 0.001, "uniform"),
    "flipud": (0.0, 1.0, "uniform"),
    "fliplr": (0.0, 1.0, "uniform"),
    "mosaic": (0.0, 1.0, "uniform"),
    "mixup": (0.0, 1.0, "uniform"),
    "copy_paste": (0.0, 1.0, "uniform"),
}


def _sample(rng: random.Random) -> Dict[str, float]:
    import math
    out = {}
    for k, (lo, hi, kind) in SEARCH_SPACE.items():
        if kind == "log" and lo > 0:
            out[k] = math.exp(rng.uniform(math.log(lo), math.log(hi)))
        else:
            out[k] = rng.uniform(lo, hi)
    return out


def run_tune(model, data: str = "synthetic", n_trials: int = 10,
             epochs_per_trial: int = 10, seed: int = 0,
             space: Optional[Dict] = None, **train_kwargs):
    """Random-search tuning loop; returns (best_cfg, best_fitness, history)."""
    rng = random.Random(seed)
    best_cfg, best_fit = None, -1.0
    history = []
    for t in range(n_trials):
        cfg = _sample(rng) if space is None else {
            k: rng.uniform(v[0], v[1]) for k, v in space.items()}
        LOGGER.info(f"tune trial {t + 1}/{n_trials}: "
                    f"lr0={cfg['lr0']:.2e} momentum={cfg['momentum']:.3f}")
        try:
            metrics = model.train(data=data, epochs=epochs_per_trial,
                                  name=f"tune_{t}", **cfg, **train_kwargs)
            fit = float(metrics.get("fitness", 0.0))
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
    search otherwise."""
    try:
        from ray import tune
        from ray.air import RunConfig
        from ray.tune.schedulers import ASHAScheduler
    except ImportError:
        LOGGER.info("ray not installed; using built-in random search")
        return run_tune(model, data=data, n_trials=max_samples,
                        **(train_args or {}), **kwargs)

    train_args = train_args or {}
    if space is None:
        space = {k: tune.uniform(lo, hi) for k, (lo, hi, _) in
                 SEARCH_SPACE.items()}
    space["data"] = data

    def _trainable(config):
        config = dict(config)
        config.update(train_args)
        metrics = model.train(**config)
        from ray.air import session
        session.report({"fitness": float(metrics.get("fitness", 0.0))})

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
