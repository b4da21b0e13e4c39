#!/bin/bash
# Round-5 TPU measurement queue. Waits for the wordlm-1b training
# pipeline (runs/wordlm1b.pid) to release the chip, then runs the
# queued measurements SEQUENTIALLY (the axon tunnel allows exactly one
# TPU process). Each step logs to /tmp/q5_*.log; completed steps
# (QUEUE-DONE) are skipped; failed steps retry on later passes (the
# tunnel flaps), max 6 passes.
set -u
cd /root/repo

wait_for_pid() {
    local pidfile=$1
    [ -f "$pidfile" ] || return 0
    local pid
    pid=$(awk '{print $2}' "$pidfile")
    [ -n "$pid" ] || return 0
    while kill -0 "$pid" 2>/dev/null; do
        sleep 60
    done
}

probe() {
    timeout 180 python -c "import jax; jax.devices()" >/dev/null 2>&1
}

run_step() {  # name timeout cmd...
    local name=$1; shift
    local to=$1; shift
    local log="/tmp/q5_${name}.log"
    if [ -f "$log" ] && grep -q "QUEUE-DONE" "$log"; then
        return 0
    fi
    echo "$(date +%T) step $name"
    timeout "$to" "$@" > "$log" 2>&1
    echo "QUEUE-EXIT=$?" >> "$log"
    grep -q "QUEUE-EXIT=0" "$log" && echo "QUEUE-DONE" >> "$log"
}

all_done() {
    for n in convert1b flasherr ops1b autotune1b quiz1b moe_trained; do
        grep -q "QUEUE-DONE" "/tmp/q5_${n}.log" 2>/dev/null || return 1
    done
    return 0
}

wait_for_pid runs/wordlm1b.pid
echo "$(date +%T) wordlm1b pipeline done; starting queue"

for pass in 1 2 3 4 5 6; do
    all_done && break
    echo "$(date +%T) pass $pass: waiting for TPU tunnel..."
    until probe; do
        sleep 240
    done
    echo "$(date +%T) tunnel is up; running queue"
    # 1. convert flagship to production checkpoints (CPU jax inside)
    run_step convert1b 2400 python scripts/trained_wordlm.py \
        --preset 1b --stage convert
    # 2. flash-attention max-error localization (VERDICT r4 next #8)
    run_step flasherr 1800 python scripts/flash_err_probe.py
    # 3. operating points with full-bf16 control (next #1a, #6)
    run_step ops1b 2400 python scripts/trained_operating_points.py \
        --dir runs/trained_wordlm1b --tag wordlm1b
    # 4. auto-tuner end-to-end on the flagship (next #7)
    run_step autotune1b 1800 bash -c \
        "python -m effort_tpu.cli autotune \
           --ckpt runs/trained_wordlm1b/ckpt_bf16 \
           --target-agreement 0.8 > artifacts/quality/autotune_wordlm1b.json"
    # 5. word-vocab quiz accuracy-vs-effort (next #9)
    run_step quiz1b 2400 python scripts/trained_quiz.py
    # 6. trained MoE with speed row + dense baseline (next #3)
    run_step moe_trained 2400 env TQ_SIZE=moe \
        python scripts/trained_quality_ondevice.py
done

# mirror the trained-MoE artifacts (speed row now included)
python - <<'EOF'
import json, os
d = "runs/trained_quality_moe"
for src, dst in (("eval.json", "eval_moe120m.json"),
                 ("calib_profile.json", "calib_profile_moe120m.json"),
                 ("train_history.json", "train_history_moe120m.json")):
    p = os.path.join(d, src)
    if os.path.exists(p):
        json.dump(json.load(open(p)),
                  open(f"artifacts/quality/{dst}", "w"), indent=1)
        print("mirrored", dst)
EOF
echo "$(date +%T) queue finished (all_done=$(all_done && echo yes || echo no))"
