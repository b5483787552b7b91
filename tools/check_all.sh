#!/bin/sh
# Full local gate: unit+oracle tests, the driver-contract simulation,
# and the sf0.1 benchmark.  Mirrors what the round driver runs.
set -e
cd "$(dirname "$0")/.."
python -m pytest tests/ -q
(cd /tmp && python "$OLDPWD/tools/driver_sim.py")
python bench.py
