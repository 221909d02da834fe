#!/usr/bin/env bash
# Green-snapshot gate: run before every snapshot/release commit.
#
# Round-2 shipped a red HEAD because a config landed without re-running the
# fast tier (VERDICT round 2, Weak #1).  This script is the gate: it fails
# unless the doctor self-check and the fast test tier are both green.
#
#   ./tools/preflight.sh            # doctor + fast tier (~3 min)
#   ./tools/preflight.sh --slow     # also the oracle tier (CI budget)
#   ./tools/preflight.sh --nightly  # everything incl. quality studies/soaks
set -euo pipefail
cd "$(dirname "$0")/.."

echo "== crowdmod doctor =="
python -m crowdmod_tpu.cli.doctor --skip-mesh

echo "== fast test tier =="
python -m pytest tests/ -m "not slow" -q

if [[ "${1:-}" == "--slow" ]]; then
  echo "== oracle test tier =="
  python -m pytest tests/ -m "slow and not nightly" -q
elif [[ "${1:-}" == "--nightly" ]]; then
  echo "== oracle + nightly test tiers =="
  python -m pytest tests/ -m slow -q
fi
echo "preflight: all green"
