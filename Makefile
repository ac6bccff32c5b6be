# One-command regression gate (VERDICT r4 item 8).
#
# The reference runs its E. coli e2e + dnadiff on every push
# (/root/reference/.github/workflows/build_docker_image.yml,
# /root/reference/docker/test/run_test.sh).  This environment has no CI
# service, so the equivalent standing gate is `make check`:
#
#   1. the full unit/parity/acceptance suite (137+ tests, includes
#      reference-binary byte-parity and the 2-process multihost pipeline)
#   2. the literal E. coli K12-shape head-to-head vs the reference
#      binaries (scripts/ecoli_h2h.py, exact-verifier identity gate)
#   3. a 50 Mb ladder rung e2e with exact full-coverage verification
#      (scripts/scale_run.py; asserts identity >= 0.9999 in-script)
#
# `make test` is the fast sub-gate (suite only).

CHECK_DIR ?= /tmp/pg_check_rung

.PHONY: check test rung h2h h2h-repeats

test:
	python -m pytest tests/ -q

h2h:
	python scripts/ecoli_h2h.py

# repeat-bearing variant (7 rRNA-like operons + IS elements — the real
# K12's repeat content); strictly harder than the plain h2h, same
# >=99.9% mutual-identity gate
h2h-repeats:
	python scripts/ecoli_h2h.py --repeats

rung:
	rm -rf $(CHECK_DIR)
	python scripts/scale_run.py $(CHECK_DIR) --genome-mb 50 --sim-direct \
	    --assert-identity 0.9999

check: test h2h-repeats rung
	@echo "make check: ALL GATES PASSED"
