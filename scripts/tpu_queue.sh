#!/bin/bash
# Wait for the axon TPU tunnel, then run the queued measurements.
# Each step logs to /tmp/q_*.log; safe to re-run (skips completed steps).
set -u
cd /root/repo

probe() {
    timeout 120 python -c "import jax; jax.devices()" >/dev/null 2>&1
}

echo "$(date +%T) waiting for TPU tunnel..."
until probe; do
    sleep 240
done
echo "$(date +%T) tunnel is up; running queue"

run_step() {  # name cmd...
    local name=$1; shift
    local log="/tmp/q_${name}.log"
    if [ -f "$log" ] && grep -q "QUEUE-DONE" "$log"; then
        echo "skip $name (done)"
        return
    fi
    echo "$(date +%T) step $name"
    timeout 2400 "$@" > "$log" 2>&1
    echo "QUEUE-EXIT=$?" >> "$log"
    grep -q "QUEUE-EXIT=0" "$log" && echo "QUEUE-DONE" >> "$log"
}

# 1. headline benchmark (confirm current numbers still hold)
run_step bench python bench.py
# 2. full-depth int4 model decode (the interrupted int4 model-level run)
run_step int4_32L python scripts/model_bench.py 32 int4 1.0,0.5,0.25 1 1 1 1 1.0
# 3. int4 quality at model level (4L, with dense baseline for ratio)
run_step int4_4L python scripts/model_bench.py 4 int4 1.0,0.5,0.25 1 1 1 1 1.0
# 4. speculative decode speed (8L, row-prefix bf16)
run_step spec python scripts/spec_bench.py 8 bf16 4,8 0.25,0.15
# 5. Mixtral-dims MoE decode, int8 buckets (the reference's Mixtral is
#    broken; ours decodes — measure it)
run_step moe_4L python scripts/model_bench.py 4 int8 1.0,0.5,0.25 1 0 0 1 1.0 8
echo "$(date +%T) queue complete"
