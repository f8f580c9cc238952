# Round-close ritual: everything the round's artifacts depend on, in the
# order that keeps them consistent with the code they vouch for.
#
#   make test        - full pytest
#   make gate        - full Spark-vs-DuckDB oracle gate at sf0.01
#   make gate-all    - gate at all three SFs
#   make plan-audit  - regenerate PLAN_AUDIT.md (MUST run at round close:
#                      a stale audit vouches for plans that no longer
#                      exist - VERDICT r6 #7)
#   make bench       - bench.py at sf0.1 (run alone: CPU contention skews)
#   make close       - gate + plan-audit + bench, sequentially

SF_DIR ?= /root/testdata/sf0.01

.PHONY: test gate gate-all plan-audit bench close

test:
	python -m pytest tests/ -q

gate:
	python scripts/check_queries.py $(SF_DIR)

gate-all:
	python scripts/check_queries.py /root/testdata/sf0.001
	python scripts/check_queries.py /root/testdata/sf0.01
	python scripts/check_queries.py /root/testdata/sf0.1

plan-audit:
	# --fresh-artifacts: clear stat-keyed /tmp artifacts so every
	# build-phase plan (training, index writes) is attributed to its
	# owning query.  NEVER run concurrently with another Spark workload.
	python scripts/plan_audit.py --fresh-artifacts $(SF_DIR)

bench:
	# --against: the SCALING.md signal rule as an exit-code gate — fails
	# on any query regressing >0.5s absolute (or >25% on a >=1s warm
	# baseline) vs the previous round's committed per-query results.
	# bench.py loads the baseline BEFORE overwriting bench_results.json.
	python bench.py --against bench_results.json

scale-smoke:
	python scripts/scale_smoke.py 10

close: gate plan-audit bench
