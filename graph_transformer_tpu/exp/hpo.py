"""Hyperparameter optimization harness.

Capability parity with the reference's Ax/BoTorch notebooks
(``find_best_hyperparams_for_dataset.ipynb`` cells 7-9,
``node_embedding_HPO.ipynb``): an ``optimize(parameters,
evaluation_function, ...)`` call over the same parameter-space description
language Ax uses —

    {"name": "num_timesteps", "type": "range",  "bounds": [1, 6]}
    {"name": "learning_rate", "type": "range",  "bounds": [1e-5, 1e-2],
     "log_scale": True}
    {"name": "sampled_num",   "type": "choice", "values": [128, 256, 512]}
    {"name": "use_thing",     "type": "fixed",  "value": True}

ax-platform is not available in this environment, so the search strategy is
quasi-random (scrambled low-discrepancy sampling) followed by a local
neighborhood refinement around the incumbent — no GP surrogate, but the same
API shape, trial log, and best-arm extraction
(``experiment.fetch_data()`` equivalent: :func:`best_arm`).
"""

from __future__ import annotations

import math
from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple

import numpy as np

Trial = Dict[str, Any]


def _sample_param(spec: Dict[str, Any], rng: np.random.Generator, u: float):
    """Draw one value for an Ax-style parameter spec from uniform sample u."""
    t = spec["type"]
    if t == "fixed":
        return spec["value"]
    if t == "choice":
        vals = spec["values"]
        return vals[min(int(u * len(vals)), len(vals) - 1)]
    if t == "range":
        lo, hi = spec["bounds"]
        is_int = isinstance(lo, int) and isinstance(hi, int) and not spec.get(
            "log_scale", False
        )
        if spec.get("log_scale", False):
            v = math.exp(math.log(lo) + u * (math.log(hi) - math.log(lo)))
        else:
            v = lo + u * (hi - lo)
        return int(round(v)) if is_int else v
    raise ValueError(f"unknown parameter type {t!r}")


def _halton(index: int, base: int) -> float:
    """Low-discrepancy Halton sequence value (deterministic coverage)."""
    f, r = 1.0, 0.0
    i = index
    while i > 0:
        f /= base
        r += f * (i % base)
        i //= base
    return r


_PRIMES = [2, 3, 5, 7, 11, 13, 17, 19, 23, 29, 31, 37]


def optimize(
    parameters: Sequence[Dict[str, Any]],
    evaluation_function: Callable[[Dict[str, Any]], float],
    total_trials: int = 20,
    objective_name: str = "objective",
    minimize: bool = False,
    seed: int = 0,
    refine_fraction: float = 0.3,
    log_fn=print,
) -> Tuple[Dict[str, Any], float, List[Trial]]:
    """Run the search; returns (best_parameters, best_value, trials).

    The first ``(1-refine_fraction)`` trials scan the space with a scrambled
    Halton sequence; the remainder perturb the incumbent (local refinement).
    """
    rng = np.random.default_rng(seed)
    shifts = rng.random(len(parameters))  # Cranley–Patterson rotation
    trials: List[Trial] = []
    best_params: Optional[Dict[str, Any]] = None
    best_value = math.inf if minimize else -math.inf
    n_explore = max(1, int(total_trials * (1.0 - refine_fraction)))

    for t in range(total_trials):
        if t < n_explore or best_params is None:
            us = [
                ( _halton(t + 1, _PRIMES[d % len(_PRIMES)]) + shifts[d]) % 1.0
                for d in range(len(parameters))
            ]
        else:
            # refine: re-encode the incumbent and jitter each coordinate
            us = []
            for d, spec in enumerate(parameters):
                u = rng.random() if spec["type"] == "choice" else None
                if spec["type"] == "range":
                    lo, hi = spec["bounds"]
                    v = best_params[spec["name"]]
                    if spec.get("log_scale", False):
                        u0 = (math.log(v) - math.log(lo)) / (
                            math.log(hi) - math.log(lo)
                        )
                    else:
                        u0 = (v - lo) / (hi - lo)
                    u = float(np.clip(u0 + rng.normal(0, 0.1), 0, 1))
                elif spec["type"] == "choice":
                    u = rng.random()
                else:
                    u = 0.0
                us.append(u)
        params = {
            spec["name"]: _sample_param(spec, rng, us[d])
            for d, spec in enumerate(parameters)
        }
        value = float(evaluation_function(params))
        trials.append({"trial": t, "params": params, objective_name: value})
        better = value < best_value if minimize else value > best_value
        if better:
            best_params, best_value = params, value
        log_fn(
            f"trial {t:03d} | {objective_name} {value:.5f} | best {best_value:.5f} | {params}"
        )
    return best_params, best_value, trials


def best_arm(trials: List[Trial], objective_name: str = "objective",
             minimize: bool = False) -> Trial:
    """Best trial record — the ``experiment.fetch_data()`` + argmax step of
    the reference notebooks (find_best… cell 14)."""
    key = lambda tr: tr[objective_name]
    return (min if minimize else max)(trials, key=key)
