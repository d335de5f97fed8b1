#!/bin/bash
# Resilient dimensionality-frontier driver: runs the d=5 certification
# to the bound, then grinds d=10 in resumable legs.  Every leg ends with
# a full FEM confirmation + artifact write (recipes.highd_frontier), so
# a crash or TPU-tunnel outage costs at most one leg; state checkpoints
# per stage.  Touch /tmp/frontier_stop to stop between legs.
#
# Durability: the Aug-19 VM restart wiped /tmp AND /root/.cache (losing
# the rank-2752 d=10 state).  Only the git repo survives restarts, so
# states now live in /root/repo/states/ and are committed after every
# leg together with the artifact.
set -u
cd /root/repo
export PGDROME_AOT_CACHE=${PGDROME_AOT_CACHE:-/root/.cache/pgdrome_aot}
export PGDROME_SETUP_CACHE=${PGDROME_SETUP_CACHE:-/root/.cache/pgdrome_setup}
STATE_DIR=/root/repo/states
mkdir -p "$STATE_DIR"

log() { echo "[orch $(date +%H:%M:%S)] $*" >> /tmp/frontier_orch.log; }

commit_leg() {  # $1 = d  (retries: the build session also commits)
    local msg
    msg="frontier d=$1 leg checkpoint: $(python - <<EOF
import json
try:
    r = json.load(open("FRONTIER_d$1.json"))
    print(f"rank {r['rank']}, verified max {r['verified']['max']:.3e}")
except Exception:
    print("state only")
EOF
)"
    for _ in 1 2 3; do
        if git add -f "$STATE_DIR/frontier_d$1_state.npz" "FRONTIER_d$1.json" 2>/dev/null; then
            git diff --cached --quiet || git commit -q -m "$msg" && return 0
        fi
        sleep 20
    done
    log "commit_leg d=$1 failed after retries"
}

run_leg() {
    local d="$1" bound="$2" minutes="$3" extra="$4"
    local state="$STATE_DIR/frontier_d${d}_state.npz"
    local resume_args=""
    [ -f "$state" ] && resume_args="--resume $state"
    log "leg d=$d bound=$bound minutes=$minutes resume=$([ -n "$resume_args" ] && echo yes || echo no)"
    timeout $(( (${minutes%.*} + 90) * 60 )) \
        python scripts/run_frontier.py --d "$d" --bound "$bound" \
        --minutes "$minutes" --max-stages 24 $resume_args \
        --state-out "$state" --artifact "FRONTIER_d${d}.json" $extra \
        >> "/tmp/frontier_d${d}.out" 2>&1
    local rc=$?
    log "leg d=$d exit $rc"
    commit_leg "$d"
    return $rc
}

bound_met() {  # artifact exists and verified.max <= bound
    python - "$1" "$2" <<'EOF'
import json, sys
try:
    r = json.load(open(sys.argv[1]))
    sys.exit(0 if r["verified"]["max"] <= float(sys.argv[2]) else 1)
except Exception:
    sys.exit(1)
EOF
}

tpu_up() {
    timeout 300 python -c "import jax; jax.devices()" >/dev/null 2>&1
}

wait_tpu() {
    until tpu_up; do
        [ -e /tmp/frontier_stop ] && return 1
        log "tpu down, waiting"
        sleep 180
    done
    log "tpu up"
}

# phase 0: re-warm the bench AOT caches (the VM restart wiped
# /root/.cache entirely; the driver's round-end bench must not hit
# 7x cold 105-390 s compiles)
warm_tries=0
while [ ! -e /tmp/frontier_stop ] && [ ! -e /tmp/bench_warm_done ]; do
    if [ "$warm_tries" -ge 3 ]; then
        log "bench re-warm gave up after $warm_tries tries, moving on"
        break
    fi
    wait_tpu || break
    log "bench re-warm starting"
    if timeout 4500 python bench.py > /tmp/bench_warm_r4.json 2> /tmp/bench_warm_r4.log; then
        touch /tmp/bench_warm_done
        log "bench re-warm ok: $(cat /tmp/bench_warm_r4.json)"
    else
        rc=$?
        warm_tries=$((warm_tries + 1))
        log "bench re-warm failed (exit $rc), try $warm_tries"
        sleep 120
    fi
done

# phase 1: d=5 to 1e-6 (round-3 probes hit 9.6e-7 at rank ~1472)
while [ ! -e /tmp/frontier_stop ]; do
    if bound_met FRONTIER_d5.json 1e-6; then log "d=5 bound met"; break; fi
    wait_tpu || break
    run_leg 5 1e-6 75 "" || sleep 120
done

# phase 2: d=10 legs toward 1e-5 (restarted from scratch after the
# /tmp wipe; state now durable in states/)
while [ ! -e /tmp/frontier_stop ]; do
    if bound_met FRONTIER_d10.json 1e-5; then log "d=10 bound met"; break; fi
    wait_tpu || break
    run_leg 10 1e-5 120 "--screener-cap 3072" || sleep 120
done
log "orchestrator done"
