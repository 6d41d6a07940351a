"""Deterministic corpus mixing: weighted multi-source composition.

Assembling a pre-training mix ("60% web, 30% code, 10% reference,
with reference seen up to 3 epochs") needs sampling that is exact in
expectation, reproducible, and cheap: no global count-driven
re-planning, no shuffle.  Built on operators/sampling.py's
content-keyed hash unit:

* downsampling a source to rate r keeps the deterministic r-prefix of
  its hash range — stable as the source grows;
* upsampling to rate r > 1 emits ``floor(r)`` full epochs plus a
  hash-selected partial epoch, tagging each copy with an ``epoch``
  ordinal so a downstream deterministic shuffle separates the
  repeats (a pipeline that forbids repetition caps r at 1 and warns
  in the plan instead of silently oversampling).

The output carries ``source`` and ``epoch`` columns — the lineage a
mix audit needs ("how many tokens of code did epoch 2 contribute?")
— and the whole plan is unions of filtered projections: Catalyst
sees through it, pushdown still reaches every source scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from arachne_spark.operators.sampling import hash_unit


def sample_epochs(
    df: DataFrame,
    key_col: str,
    rate: float,
    salt: str = "mix",
) -> DataFrame:
    """``rate`` ∈ (0, ∞): expected copies of each row, content-keyed.
    rate=0.25 keeps a quarter; rate=2.5 emits two full epochs plus a
    deterministic half epoch.  Adds an ``epoch`` ordinal column."""
    if rate <= 0:
        raise ValueError(f"rate must be positive: {rate}")
    full = int(rate)
    frac = rate - full
    parts = [
        df.withColumn("epoch", F.lit(e)) for e in range(full)
    ]
    if frac > 0:
        parts.append(
            df.where(
                hash_unit(F.col(key_col), f"{salt}:partial") < F.lit(frac)
            ).withColumn("epoch", F.lit(full))
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def mix_corpora(
    sources: dict[str, tuple[DataFrame, float]],
    key_col: str,
    salt: str = "mix",
) -> DataFrame:
    """Union the named sources, each at its rate (expected copies per
    row), tagged with ``source`` and ``epoch``.  Column sets must
    match across sources (enforced by unionByName).  Rates are
    per-source absolute sampling rates — computing them from target
    token proportions is the caller's (counted, audited) step, kept
    out of this operator so the mix plan never embeds a hidden
    count() action."""
    if not sources:
        raise ValueError("sources must be non-empty")
    out = None
    for name, (df, rate) in sources.items():
        part = sample_epochs(
            df, key_col, rate, salt=f"{salt}:{name}"
        ).withColumn("source", F.lit(name))
        out = part if out is None else out.unionByName(part)
    return out
