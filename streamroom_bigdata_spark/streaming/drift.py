"""Streaming distribution-drift alarm (PSI) — the monitoring twin of
``operators/changes.drift_psi_event_types``.

The batch operator answers "did the categorical mix drift between two
epochs" retrospectively; a serving pipeline wants the same answer PER
TUMBLING WINDOW as the stream runs, against a frozen baseline mix. Same
progression the CUSUM family made (batch changepoint locator →
``cusum_alarm_stateful``): this completes the drift matrix.

Design:

- One stateful operator: a watermarked tumbling-window aggregate whose
  per-window state is |baseline| conditional counts + a total — the
  category domain is FIXED by the baseline (a monitoring config, not
  data), so the aggregation row is enum-width and the windowed state is
  bounded by (windows in flight) × (|types| + 1) longs.
- PSI is stateless arithmetic over that row: with Laplace smoothing
  p_t = (c_t + eps) / (n + eps·|T|), psi = Σ (p_t − b_t)·ln(p_t/b_t).
  Smoothing matters in the streaming setting: a category VANISHING from a
  window is exactly the drift an alarm must flag, so zero counts must
  stay finite (the batch operator instead drops never-seen types — its
  retrospective contract surfaces them as count columns).
- ``psi_drift`` is one function for BOTH engines of the twin: a batch
  DataFrame takes the identical plan minus the watermark, which is how
  the agreement test pins streaming == batch per closed window.

Baseline rates must be strictly positive and sum to ~1 (validated) —
derive them with :func:`baseline_rates` from a reference epoch.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Laplace smoothing pseudo-count per category (applied to the WINDOW side
#: only; the baseline is required positive)
PSI_EPS = 0.5

#: default alarm threshold — the conventional "significant shift" PSI level
PSI_THRESHOLD = 0.2


def baseline_rates(events: DataFrame, type_col: str = "event_type") -> dict:
    """Frozen per-category rates from a reference (batch) epoch — an
    enum-sized collect. Types are smoothed with the same PSI_EPS so a
    later window can contain a type the baseline never saw without an
    infinite term (the dict carries every OBSERVED type; unseen-at-serve
    types must be added by the caller before monitoring them)."""
    counts = {
        r["t"]: r["c"]
        for r in events.groupBy(F.col(type_col).alias("t"))
        .agg(F.count("*").alias("c"))
        .collect()
    }
    n = sum(counts.values())
    k = len(counts)
    return {
        t: (c + PSI_EPS) / (n + PSI_EPS * k) for t, c in sorted(counts.items())
    }


def psi_drift(
    events: DataFrame,
    baseline: dict,
    *,
    window: str = "10 minutes",
    watermark: str = "10 minutes",
    threshold: float = PSI_THRESHOLD,
    eps: float = PSI_EPS,
) -> DataFrame:
    """Per-tumbling-window PSI of the ``event_type`` mix against
    ``baseline`` (type → rate), with an ``alarm`` flag at ``threshold``.
    Works on a streaming DataFrame (append mode: a window emits once,
    when the watermark closes it) AND on a batch DataFrame (same plan,
    watermark skipped) — the agreement contract of the twin.

    The category domain is the baseline's key set: counts outside it fold
    into ``n_other`` (their best-possible PSI treatment needs a baseline
    rate, which by definition doesn't exist — surfaced as a count, like
    the batch operator's excluded-type columns)."""
    if not baseline:
        raise ValueError("baseline must be non-empty")
    bad = {t: r for t, r in baseline.items() if not r > 0}
    if bad:
        raise ValueError(f"baseline rates must be positive: {bad}")
    tot = sum(baseline.values())
    if abs(tot - 1.0) > 1e-6:
        raise ValueError(f"baseline rates must sum to 1 (got {tot})")

    types = sorted(baseline)
    k = len(types)
    aggs = [
        F.sum(F.when(F.col("event_type") == t, 1).otherwise(0)).alias(f"c_{i}")
        for i, t in enumerate(types)
    ]
    src = events
    if events.isStreaming:
        src = events.withWatermark("ts", watermark)
    win = src.groupBy(F.window("ts", window).alias("w")).agg(
        *aggs, F.count("*").alias("n_rows")
    )
    in_domain = None
    for i in range(k):
        c = F.col(f"c_{i}")
        in_domain = c if in_domain is None else in_domain + c
    n_sm = in_domain.cast("double") + F.lit(eps * k)
    psi = None
    for i, t in enumerate(types):
        p = (F.col(f"c_{i}").cast("double") + F.lit(eps)) / n_sm
        b = F.lit(float(baseline[t]))
        term = (p - b) * F.log(p / b)
        psi = term if psi is None else psi + term
    return win.select(
        F.col("w.start").alias("window_start"),
        F.col("w.end").alias("window_end"),
        in_domain.cast("long").alias("n_events"),
        (F.col("n_rows") - in_domain).cast("long").alias("n_other"),
        F.round(psi, 8).alias("psi"),
        (psi > F.lit(float(threshold))).alias("alarm"),
    )


def psi_reference(counts: dict, baseline: dict, eps: float = PSI_EPS) -> float:
    """Pure-Python PSI of a window's count dict against the baseline —
    the test oracle for :func:`psi_drift` (identical smoothing)."""
    types = sorted(baseline)
    n = sum(counts.get(t, 0) for t in types)
    n_sm = n + eps * len(types)
    psi = 0.0
    for t in types:
        p = (counts.get(t, 0) + eps) / n_sm
        b = baseline[t]
        psi += (p - b) * math.log(p / b)
    return psi
