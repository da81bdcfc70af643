"""Deterministic hash-stratified corpus sampling (training-data op).

A 100 TB pretraining pipeline rarely trains on the whole crawl — it takes
a per-stratum sample (per language, per quality band, per source) with
REPRODUCIBLE membership: the same document must land in the same split on
every run, on every re-partitioning, with no RNG state to ship between
executors. The standard trick is a pure hash gate: keep a row iff
hash(id) falls below the stratum's rate threshold.

Implementation notes:
  * the gate is the engine's portable 31-bit LCG (operators/anf.py) so a
    SQL oracle can replay membership EXACTLY — integer arithmetic only,
    no float thresholds (rates become integer cutoffs on the driver);
  * a ``seed`` shifts the hash stream so independent samples (train vs
    eval splits) are uncorrelated but still deterministic;
  * the whole gate is one Catalyst filter expression — predicate-pushdown
    eligible, no shuffle, no Python, no sampling skew (membership is
    independent per row, so executors never coordinate).

This is distinct from DataFrame.sample(): that is seeded per-partition
RNG, so membership changes whenever partitioning changes — useless for
reproducible corpus splits.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..operators.anf import _LCG_A, _LCG_C, _LCG_M

__all__ = ["sample_gate", "stratified_sample"]


def sample_gate(id_col: Column, rate: float, seed: int = 0) -> Column:
    """Boolean Column: deterministically keep ~``rate`` of ids. The
    threshold is the integer floor(rate * 2^31), so membership is exact
    integer arithmetic (oracle-replayable verbatim)."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError(f"rate must be in [0, 1], got {rate}")
    return _hash(id_col, seed) < int(rate * _LCG_M)


def _hash(id_col: Column, seed: int) -> Column:
    """Seeded portable hash: the id is XORed with an LCG-scrambled seed
    constant BEFORE the multiply. The non-linearity matters: any purely
    additive/affine seeding makes the streams for two seeds differ by a
    constant offset, so their membership sets are near-copies (or
    near-complements) of each other instead of independent draws. XOR is
    ANSI-portable (DuckDB ``xor()``), keeping the gate oracle-replayable."""
    mix = ((seed % _LCG_M) * _LCG_A + _LCG_C) % _LCG_M
    x = F.pmod(id_col, F.lit(_LCG_M)).bitwiseXOR(F.lit(mix))
    return (x * _LCG_A + _LCG_C) % _LCG_M


def stratified_sample(
    df: DataFrame,
    id_col: str,
    strata_col: str,
    rates: dict[str, float],
    default_rate: float = 0.0,
    seed: int = 0,
) -> DataFrame:
    """Keep each row iff its deterministic hash clears its stratum's rate
    (e.g. ``rates={"en": 0.5, "de": 1.0}`` over a language column). Strata
    not listed get ``default_rate``. One codegen'd filter, no shuffle."""
    for k, r in rates.items():
        if not 0.0 <= r <= 1.0:
            raise ValueError(f"rate for stratum {k!r} must be in [0, 1], got {r}")
    if not 0.0 <= default_rate <= 1.0:
        raise ValueError(f"default_rate must be in [0, 1], got {default_rate}")
    h = _hash(F.col(id_col), seed)
    cut = F.lit(int(default_rate * _LCG_M))
    for k, r in sorted(rates.items()):
        cut = F.when(F.col(strata_col) == k, int(r * _LCG_M)).otherwise(cut)
    return df.filter(h < cut)
