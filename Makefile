# Test tiers (single-core box: the full suite is ~35-45 min serial).
#   make test-fast   — quick green-check, no slow-marked tests (~5-8 min)
#   make test-slow   — the slow tier only (multiprocess e2e, preemption,
#                      Pallas-interpret kernel parity, heavy FID e2e)
#   make test        — everything
# Durations per file are recorded in ROADMAP.md ("Test suite timing").
PYTEST ?= python -m pytest

.PHONY: test test-fast test-slow

test:
	$(PYTEST) tests/ -q

test-fast:
	$(PYTEST) tests/ -q -m "not slow"

test-slow:
	$(PYTEST) tests/ -q -m "slow"
