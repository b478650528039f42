"""Shared runner for the whole-registry robustness sweeps (empty-input
and null-injection): every registered query is still exercised, but the
PLAN-PURE population — the queries the Exchange audit in
tests/test_plans.py certifies as pure plan constructions with no eager
state builds, session-conf writes, or persisted artifacts — overlaps on
a small driver thread pool (the optimization guide's §2.6 pattern:
actions are only sequential because the driver calls them
sequentially).  Everything else (table verbs, streaming waves, funnel
state, ANN trainers, conf-toggling queries) keeps the exact serial
order it always had, because those paths share /tmp state directories
and session confs that must not race.

This is wall-time recovery, not coverage reduction: the same 297
queries run with the same assertion (r12 verdict #1 — the driver's
pytest run was cut off on wall time; these two sweeps were ~10 minutes
of serial sub-second collects)."""

from __future__ import annotations

from concurrent.futures import ThreadPoolExecutor


def _plan_pure_names() -> set[str]:
    from tests.test_plans import RUNTIME_EXCHANGE_PINS, SHUFFLE_BUDGET

    return set(SHUFFLE_BUDGET) | set(RUNTIME_EXCHANGE_PINS)


def run_sweep(specs: dict, sf: str, spark) -> list[str]:
    """Run every query's fn(spark, sf).collect(); return failure lines."""
    failures: list[str] = []
    pure = _plan_pure_names()

    def attempt(item):
        name, spec = item
        try:
            spec.fn(spark, sf).collect()
            return None
        except Exception as exc:  # noqa: BLE001 — collecting the full report
            return f"{name}: {type(exc).__name__}: {str(exc)[:120]}"

    pooled = [(n, s) for n, s in specs.items() if n in pure]
    serial = [(n, s) for n, s in specs.items() if n not in pure]
    with ThreadPoolExecutor(max_workers=6) as pool:
        failures.extend(f for f in pool.map(attempt, pooled) if f)
    failures.extend(f for f in map(attempt, serial) if f)
    return failures
