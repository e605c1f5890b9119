# ttmf_ray round-evidence targets (see CLAUDE.md for the full notes)
PY ?= python
SF ?= /root/testdata/sf0.01

.PHONY: test sim sim-small bench scaling

test:            ## full pytest suite (~10 min; session-scoped Ray, 4 cpus)
	$(PY) -m pytest tests/ -x -q

sim:             ## full driver-sim: every queries() vs oracle_sql() at sf0.01
	$(PY) tests/oracle_harness.py --sf $(SF)

sim-small:       ## same sweep at sf0.001 (fast pre-flight)
	$(PY) tests/oracle_harness.py --sf /root/testdata/sf0.001

bench:           ## headline one-line JSON (env: GRAFT_SF_DIR, RAY_GRAFT_CPUS)
	$(PY) bench.py

scaling:         ## N vs 4N evidence (RAY_GRAFT_CPUS_LO/HI, needs a quiet box)
	$(PY) bench.py --scaling
