#!/bin/bash
# Regrind the d=7 frontier with DURABLE state (the Aug-19 VM restart
# wiped /tmp, losing the original rank-3840 d=7 state; the artifact
# survives but state provenance does not).  Resumable 70-min legs,
# commit after each; on bound met, run the goal-oriented output
# certification on the fresh state.  Touch /tmp/d7_stop to stop.
set -u
cd /root/repo
export PGDROME_AOT_CACHE=${PGDROME_AOT_CACHE:-/root/.cache/pgdrome_aot}
export PGDROME_SETUP_CACHE=${PGDROME_SETUP_CACHE:-/root/.cache/pgdrome_setup}
STATE=states/frontier_d7_state.npz

log() { echo "[d7 $(date +%H:%M:%S)] $*" >> /tmp/d7_orch.log; }

bound_met() {
    python - <<'EOF'
import json, sys
try:
    r = json.load(open("FRONTIER_d7_regrind.json"))
    sys.exit(0 if r["verified"]["max"] <= 1e-6 else 1)
except Exception:
    sys.exit(1)
EOF
}
# the regrind writes its OWN artifact: the committed round-3
# FRONTIER_d7.json (9.87e-7, state lost to the VM wipe) must not be
# replaced by a partial state if the round ends mid-grind.

tpu_up() { timeout 300 python -c "import jax; jax.devices()" >/dev/null 2>&1; }

commit_leg() {
    for _ in 1 2 3; do
        git add -f "$STATE" FRONTIER_d7_regrind.json 2>/dev/null || true
        if git diff --cached --quiet; then return 0; fi
        git commit -q -m "frontier d=7 regrind checkpoint: $(python - <<'EOF'
import json
try:
    r = json.load(open("FRONTIER_d7_regrind.json"))
    print(f"rank {r['rank']}, verified max {r['verified']['max']:.3e}")
except Exception:
    print("state only")
EOF
)" && return 0
        sleep 20
    done
    log "commit failed after retries"
}

while [ ! -e /tmp/d7_stop ]; do
    if bound_met; then log "d=7 bound met"; break; fi
    until tpu_up; do
        [ -e /tmp/d7_stop ] && exit 0
        log "tpu down, waiting"; sleep 180
    done
    resume=""
    [ -f "$STATE" ] && resume="--resume $STATE"
    log "leg start resume=$([ -n "$resume" ] && echo yes || echo no)"
    timeout 9600 python scripts/run_frontier.py --d 7 --bound 1e-6 \
        --minutes 70 --max-stages 24 $resume --state-out "$STATE" \
        --artifact FRONTIER_d7_regrind.json >> /tmp/frontier_d7.out 2>&1
    rc=$?
    log "leg exit $rc"
    commit_leg
    # backoff on failure: a fast-failing leg must not busy-loop the
    # 1-core host (frontier_orchestrator.sh guards the same way)
    [ "$rc" -ne 0 ] && sleep 120
done

if bound_met && [ ! -e /tmp/d7_stop ]; then
    log "goal-oriented pass starting"
    timeout 9600 python scripts/run_goal_oriented.py --d 7 \
        --state "$STATE" --sensors 0.5 0.25 --bound 1e-8 \
        --minutes 40 --artifact FRONTIER_DUAL_d7.json \
        --state-prefix states/frontier_dual_d7 \
        >> /tmp/gof_d7.out 2>&1
    log "goal-oriented exit $?"
    git add -f FRONTIER_DUAL_d7.json states/frontier_dual_d7_s*.npz \
        2>/dev/null
    git diff --cached --quiet || git commit -q -m \
        "d=7 goal-oriented output certification artifact"
fi
log "d7 orchestrator done"
