"""Engine tuning knobs for the 100× story (SURVEY §6 / VERDICT r7 #8).

Every scale-sensitive constant the operators consult lives here, with
one documented sizing rule each, instead of being buried per-module.
Defaults reproduce the repo's measured local[32] behavior; a cluster
deployment overrides them once, at the ``Engine`` boundary.

Knobs and how to size them:

``shuffle_partitions``
    Explicit repartition width for the hot text/dedup/similarity ops
    (``_helpers.shuffle_parts``).  ``None`` (default) derives it from
    ``sparkContext.defaultParallelism`` — total scheduler cores — which
    is the right call on any homogeneous cluster.  Override only when
    executors are memory-tight relative to cores: size so that
    (corpus bytes after the explode) / partitions fits a task's memory
    budget, i.e. partitions ≈ exploded_bytes / (0.5 × executor memory
    per task slot).
``min_shuffle_partitions``
    Floor under the derived value (default 8) so toy inputs still
    parallelize past a single file's task count.
``exact_pair_budget``
    Ceiling on Σ df·(df−1)/2 candidate rows the exact-Jaccard inverted
    index self-join may generate before the in-plan guard aborts
    (default 2×10⁸ ≈ minutes of work at local[32]).  Size to
    cluster_cores × rows_per_core_you_will_wait_for; the guard exists
    to keep the sf-bounded ground-truth generators from being pointed
    at corpus-scale inputs, so keep it ≪ the LSH path's capacity.
``simhash_cand_budget``
    Same ceiling for the SimHash 16-bit-chunk candidate join (default
    5×10⁸; higher than exact because rows are narrow).  Trips on
    signature-saturating (closed-vocab) corpora where the true answer
    itself is quadratic — see BASELINE.md r7.
``auto_broadcast_mb``
    When set, ``Engine`` writes spark.sql.autoBroadcastJoinThreshold.
    Size to ~2% of executor memory; the operators broadcast dimensions
    explicitly where they KNOW the side is bounded, so this only
    affects Catalyst's automatic choices.
``star_contractions_per_probe``
    Large/small-star contraction rounds executed between convergence
    probes in ``_star_contract`` (default 1).  Raise only when driver
    round-trip latency dominates the per-round jobs — i.e. a remote
    driver with many-round (high-diameter) graphs.  Measured at sf0.1
    (BASELINE.md r8): the MinHash pair graph converges in 2 probes
    either way, so 2-per-probe doubles the contraction work for zero
    saved round-trips (11.4 s → 18.0 s) — hence the conservative
    default.

Thread-local-free by design: the config is process-global (Spark apps
configure once at startup), with a context manager for tests.
"""

from __future__ import annotations

from contextlib import contextmanager
from dataclasses import dataclass, replace


@dataclass(frozen=True)
class EngineConfig:
    shuffle_partitions: int | None = None
    min_shuffle_partitions: int = 8
    exact_pair_budget: int = 200_000_000
    simhash_cand_budget: int = 500_000_000
    auto_broadcast_mb: int | None = None
    star_contractions_per_probe: int = 1


_current = EngineConfig()


def get_config() -> EngineConfig:
    return _current


def set_config(cfg: EngineConfig) -> EngineConfig:
    global _current
    _current = cfg
    return cfg


@contextmanager
def config_overrides(**overrides):
    """Temporarily override knobs (tests / notebook experiments)."""
    global _current
    prev = _current
    _current = replace(prev, **overrides)
    try:
        yield _current
    finally:
        _current = prev
