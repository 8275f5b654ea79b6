#!/bin/bash
# Round-end guard for the 4 heavy full-refinement oracles (free-flying
# robot, shuttle reentry, space station, tumour anti-angiogenesis).
# These are excluded from the default suite (`pytest.ini` addopts) but a
# regression here must not ship silently (it did once, in round 3) —
# run this at least once per round and commit the resulting
# HEAVY_r*.json.
#
# Usage: scripts/run_heavy_oracles.sh [round-tag]   (e.g. r05)
set -u
TAG="${1:-manual}"
OUT="HEAVY_${TAG}.json"
START=$(date +%s)
python -m pytest tests/ -m heavy -q -p no:cacheprovider \
    > "/tmp/heavy_${TAG}.log" 2>&1
RC=$?
END=$(date +%s)
SUMMARY=$(tail -1 "/tmp/heavy_${TAG}.log" | tr -d '"')
python - "$OUT" "$RC" "$((END-START))" "$SUMMARY" <<'PY'
import json, sys
out, rc, secs, summary = sys.argv[1:5]
json.dump({"rc": int(rc), "ok": int(rc) == 0, "wall_s": int(secs),
           "summary": summary}, open(out, "w"), indent=1)
print(open(out).read())
PY
exit $RC
