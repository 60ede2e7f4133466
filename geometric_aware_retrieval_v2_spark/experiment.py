"""quick_experiment parity — the reference's one-liner experiment API.

The reference's ``geoIR.quick_experiment`` (geoIR/__init__.py:51-128) is an
explicit prototype: it builds a validated ExperimentConfig, loads an
encoder, warns "Returning mock results. Use scripts/finetune.py for full
experiments.", and returns HARD-CODED metrics plus the config dump — in
every environment, including its own. This module reproduces that API
surface faithfully (same validation rules from geoIR/core/config.py:20-56,
same warning, same mock metrics, same result shape) so a reference user's
calling code runs unchanged; the encoder slot is the engine's deterministic
hashing encoder (the documented substitute for the un-downloadable
sentence-transformers models, functions/hashing.py). Real evaluation lives
in the driver-gated operators (ndcg_recall, the flagship pipelines) and the
CLI ``eval`` subcommand — this function intentionally mirrors the
reference's mock contract rather than inventing behavior it never had.
"""

from __future__ import annotations

import warnings
from typing import Any

from .plans.trainer import TrainerConfig


def _validate_trainer(trainer: dict[str, Any]) -> None:
    """Reference TrainerConfig validators (geoIR/core/config.py:35-67).

    Validates by constructing the engine's TrainerConfig — the single
    implementation of the reference's validator set (k_graph/lambdas/
    backend AND the lr positivity + >0.1 warning, config.py:60-67) — so
    this entry point cannot drift from plans.trainer."""
    TrainerConfig(**trainer)


def quick_experiment(
    model_name: str = "hashing-encoder-512",
    dataset: str = "beir/fiqa",
    k: int = 20,
    geometric: bool = True,
    **kwargs: Any,
) -> dict[str, Any]:
    """One-liner for geometric retrieval experiments (reference parity).

    Mirrors geoIR.quick_experiment exactly: validates the config, warns
    that the function is a prototype, and returns the reference's own
    mock metrics with the config echo. ``**kwargs`` override trainer
    fields, as in the reference (geoIR/__init__.py:96-102)."""
    trainer = {
        "epochs": 1,
        "batch_size": 16,
        "lr": 2e-5,
        "verbose": True,
        "k_graph": k,
        "geodesic": geometric,
        "lambda_ricci": 0.1 if geometric else 0.0,
        "lambda_forman": 0.05 if geometric else 0.0,
        "kappa_target": 0.0,
        "ricci_backend": "ricci_ollivier",
    }
    unknown = set(kwargs) - set(trainer)
    if unknown:  # ExperimentConfig(extra="forbid"), config.py:96-97
        raise ValueError(f"Unknown trainer parameters: {sorted(unknown)}")
    trainer.update(kwargs)
    _validate_trainer(trainer)

    config = {
        "encoder": {"model_name": model_name, "mode": "dual", "normalize": True},
        "dataset": dataset,
        "trainer": trainer,
        "device": None,
        "dry_run": False,
        "output_dir": None,
    }

    warnings.warn(
        "quick_experiment() is a prototype. Returning mock results. "
        "Use the driver-gated pipelines (bm25_geodesic_indexed, ndcg_recall) "
        "for real experiments.",
        UserWarning,
        stacklevel=2,
    )
    # the reference's hard-coded mock metrics (geoIR/__init__.py:123-128)
    return {
        "ndcg_10": 0.456,
        "map": 0.234,
        "recall_100": 0.789,
        "config": config,
    }
