"""Engine configuration with the reference's validation contract,
re-expressed as a plain dataclass (no pydantic dependency).

Reference parity (/root/reference/geoIR/core/config.py:35-57):
  * k_graph >= 5 ("meaningful graph connectivity"), warn above 100;
  * regularization weights (lambda_ricci, lambda_forman) non-negative,
    warn above 10.0;
  * curvature backend restricted to {ricci_ollivier, forman, auto} — in this
    engine ricci_ollivier degrades to forman (the reference itself falls back
    without its optional OT package; documented permanent deviation).
"""

from __future__ import annotations

import warnings
from dataclasses import dataclass, field

VALID_CURVATURE_BACKENDS = {"ricci_ollivier", "forman", "auto"}


def validate_geo_params(
    k_graph: int, lambda_ricci: float, lambda_forman: float
) -> None:
    """The reference's shared TrainerConfig/GeoConfig validators
    (geoIR/core/config.py:35-56), factored once so GeoConfig,
    plans.trainer.TrainerConfig, and experiment.quick_experiment cannot
    drift from each other. Backend validation stays per-caller (the
    reference emits different messages at its two sites)."""
    if k_graph < 5:
        raise ValueError("k_graph must be >= 5 for meaningful graph connectivity")
    if k_graph > 100:
        warnings.warn(
            f"k_graph={k_graph} may be computationally expensive for large datasets"
        )
    for v in (lambda_ricci, lambda_forman):
        if v < 0:
            raise ValueError("Regularization weights must be non-negative")
        if v > 10.0:
            warnings.warn(f"Large regularization weight {v} may dominate training")


@dataclass
class GeoConfig:
    """Geometric-stage knobs shared by the rerank/curvature pipelines."""

    k_graph: int = 10
    geodesic: bool = False
    lambda_ricci: float = 0.0
    lambda_forman: float = 0.0
    kappa_target: float = 0.0
    ricci_backend: str = "ricci_ollivier"

    def __post_init__(self) -> None:
        validate_geo_params(self.k_graph, self.lambda_ricci, self.lambda_forman)
        if self.ricci_backend not in VALID_CURVATURE_BACKENDS:
            raise ValueError(
                f"ricci_backend must be one of {VALID_CURVATURE_BACKENDS}, "
                f"got '{self.ricci_backend}'"
            )


@dataclass
class IndexConfig:
    """Lexical-index knobs (engine-specific; validated at build entry)."""

    n_partitions: int = 8
    n_shards: int = 8
    block_size: int = 128
    tokenizer_mode: str = "ws"

    def __post_init__(self) -> None:
        if self.n_partitions < 1 or self.n_shards < 1:
            raise ValueError("n_partitions and n_shards must be >= 1")
        if self.block_size < 8:
            raise ValueError("block_size must be >= 8 (block-max bounds degenerate)")
        if self.tokenizer_mode not in {"ws", "code", "code2"}:
            raise ValueError(f"unknown tokenizer mode: {self.tokenizer_mode}")


@dataclass
class EngineConfig:
    geo: GeoConfig = field(default_factory=GeoConfig)
    index: IndexConfig = field(default_factory=IndexConfig)
