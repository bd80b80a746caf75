#!/bin/sh
# Pre-snapshot gate: the ENFORCED analog of the reference's CI
# (.azure-pipelines/, devtools/ci/). Run before every snapshot/commit of a
# milestone; a red step here means DO NOT SHIP.
#
#   ./gate.sh          full gate: CPU suite + on-device tier + headline bench
#   ./gate.sh fast     CPU suite only (skips slow statistical gates)
#
# Exit code is nonzero when any stage fails.
set -e
cd "$(dirname "$0")"

echo "== stage 1: CPU test suite =="
if [ "$1" = "fast" ]; then
    python -m pytest tests/ -q -m "not slow"
    exit $?
fi
python -m pytest tests/ -q

echo "== stage 2: on-device (TPU) tier =="
python -m pytest tests_tpu/ -q

echo "== stage 3: headline bench (must print one finite JSON line) =="
python bench.py | tee /tmp/gate_bench.json
python - <<'EOF'
import json
line = [l for l in open("/tmp/gate_bench.json") if l.strip().startswith("{")][-1]
d = json.loads(line)
assert d["value"] > 0, d
print("gate: bench OK at %.2f %s" % (d["value"], d["unit"]))
EOF
echo "== gate green =="
