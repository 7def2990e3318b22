#!/bin/bash
# Round-4 evidence chain: serialize the remaining TPU work on the single chip
# and commit each artifact the moment it exists (VERDICT r3 items 1-4, 9).
#
#   stage 1  wait for the live v3 run (65k cosine) to finish
#   stage 2  eval_suite on v3 @65k  (NFE sweep + ECSQ + bits8 + cross-family)
#            + listenable WAV pairs                                  -> commit
#   stage 3  QAT fine-tune 65k->77k (configs/imf_qat_ecsq.json, STE ECSQ,
#            mixed family) seeded from the v3 checkpoint, supervised -> commit
#   stage 4  eval_suite on QAT @77k with the ECSQ rate grid          -> commit
#   stage 7  trainer-MFU probe at the ch1024 bench geometry (1.2k)   -> commit
#   stage 8  corpus rehearsal: 5k trainer-scale steps from FLAC dir  -> commit
#   stage 5  frontier ch256-s8 run (50k, mixed family), supervised   -> commit
#   stage 6  eval_suite on frontier + RTF point                      -> commit
#
# Stage order 7 -> 8 -> 5 -> 6 (since the round-4 machine reset): the two
# bounded probes land their evidence first; the long frontier run then owns
# the chip and keeps training across the round boundary (v3 precedent).
#
# Idempotent: each stage drops a stamp in outputs/round4_stamps/ and is
# skipped on relaunch. Run detached:  nohup bash tools_round4_chain.sh &
set -u
cd /root/repo
STAMPS=outputs/round4_stamps
mkdir -p "$STAMPS"
log() { echo "[chain $(date -u '+%F %T')] $*"; }

wait_pid() { # wait_pid <pidfile>
    local pid
    pid=$(cat "$1" 2>/dev/null) || return 0
    while kill -0 "$pid" 2>/dev/null; do sleep 30; done
}

commit_globs() { # commit_globs <message> <path glob>...
    local msg=$1; shift
    local any=0
    for g in "$@"; do
        for f in $g; do [ -e "$f" ] && git add -f "$f" && any=1; done
    done
    if [ "$any" = 1 ] && ! git diff --cached --quiet; then
        git commit -q -m "$msg

No-Verification-Needed: output artifacts / run logs only, no source change"
        log "committed: $msg"
    else
        log "nothing to commit for: $msg"
    fi
}

run_supervised() { # run_supervised <config> <workdir> <pidfile> [extra args...]
    local cfg=$1 wd=$2 pidfile=$3; shift 3
    mkdir -p "$wd"  # the log redirect below needs the dir before the trainer makes it
    python -m meanflow_audio_codec_tpu.tools.supervise --stall-timeout 600 -- \
        --config "$cfg" --workdir "$wd" "$@" >> "$wd/supervise_chain.log" 2>&1 &
    echo $! > "$pidfile"
    log "launched $cfg (pid $(cat "$pidfile"))"
    wait_pid "$pidfile"
    log "finished $cfg"
}

V3=outputs/imf_audio_quality_v3
QAT=outputs/imf_qat_ecsq
FRT=outputs/imf_frontier_ch256

# ---- stage 1: let v3 finish --------------------------------------------
if [ ! -f "$STAMPS/1_v3_done" ]; then
    log "stage 1: waiting for v3 to reach 65k"
    wait_pid /tmp/v3.pid
    touch "$STAMPS/1_v3_done"
fi

# ---- stage 2: v3 evidence ----------------------------------------------
if [ ! -f "$STAMPS/2_v3_eval" ]; then
    log "stage 2: eval_suite on v3 @65k"
    timeout 7200 python -m meanflow_audio_codec_tpu.tools.eval_suite \
        --workdir "$V3" --label _step65k
    timeout 1800 python -m meanflow_audio_codec_tpu.tools.export_samples \
        --workdir "$V3" --num-clips 4 --nfe 1 --bits 8
    commit_globs "v3 65k evidence: NFE sweep + stored-format + cross-family + WAV pairs" \
        "$V3/evaluation_results_step65k*.json" "$V3/samples/*" \
        "$V3/logs/train_log.jsonl" "$V3/config.json"
    touch "$STAMPS/2_v3_eval"
fi

# ---- stage 3: QAT fine-tune 65k -> 77k ---------------------------------
if [ ! -f "$STAMPS/3_qat_done" ]; then
    log "stage 3: QAT fine-tune"
    mkdir -p "$QAT/checkpoints"
    if ! ls "$QAT"/checkpoints/*.msgpack >/dev/null 2>&1; then
        latest=$(ls -t "$V3"/checkpoints/*.msgpack | head -1)
        cp "$latest" "$QAT/checkpoints/"
        meta="${latest%.msgpack}.metadata.json"
        [ -f "$meta" ] && cp "$meta" "$QAT/checkpoints/"
        log "seeded QAT from $(basename "$latest")"
    fi
    run_supervised configs/imf_qat_ecsq.json "$QAT" /tmp/qat.pid --resume
    touch "$STAMPS/3_qat_done"
fi

# ---- stage 4: QAT evidence (ECSQ rate grid) ----------------------------
if [ ! -f "$STAMPS/4_qat_eval" ]; then
    log "stage 4: eval_suite on QAT @77k"
    timeout 7200 python -m meanflow_audio_codec_tpu.tools.eval_suite \
        --workdir "$QAT" --label _step77k --family mixed \
        --latent-steps 0.5 0.7 1.0 1.5 2.0 --latent-bits 8
    timeout 1800 python -m meanflow_audio_codec_tpu.tools.export_samples \
        --workdir "$QAT" --num-clips 4 --nfe 1 --step-frac 0.5
    commit_globs "QAT 77k evidence: ECSQ rate grid + cross-family + WAV pairs" \
        "$QAT/evaluation_results_step77k*.json" "$QAT/samples/*" \
        "$QAT/logs/train_log.jsonl" "$QAT/config.json"
    touch "$STAMPS/4_qat_eval"
fi

# ---- stage 7: production-trainer MFU probe at bench geometry ------------
if [ ! -f "$STAMPS/7_mfu_probe" ]; then
    log "stage 7: trainer MFU probe (ch1024, 1.2k steps)"
    timeout 3600 python train.py --config configs/trainer_mfu_ch1024.json \
        > outputs/trainer_mfu_ch1024_run.log 2>&1
    commit_globs "production-trainer MFU probe at the ch1024 bench geometry" \
        "outputs/trainer_mfu_ch1024/logs/train_log.jsonl" \
        "outputs/trainer_mfu_ch1024_run.log"
    touch "$STAMPS/7_mfu_probe"
fi

# ---- stage 8: corpus rehearsal ------------------------------------------
if [ ! -f "$STAMPS/8_rehearsal" ]; then
    log "stage 8: corpus rehearsal (5k steps from outputs/corpus_flac)"
    n_flac=$(ls outputs/corpus_flac/*.flac 2>/dev/null | wc -l)
    if [ "$n_flac" -lt 1000 ]; then
        log "stage 8: synthesizing the 1k-clip FLAC corpus first (have $n_flac)"
        if ! timeout 3600 python -m meanflow_audio_codec_tpu.tools.make_corpus \
            --out-dir outputs/corpus_flac --family mixed --num-clips 1000 \
            --seconds 4.46 --format flac --seed 7 \
            > outputs/corpus_flac_make.log 2>&1; then
            log "stage 8: make_corpus FAILED (rc=$?) — not proceeding to rehearsal"
            exit 1
        fi
        n_flac=$(ls outputs/corpus_flac/*.flac 2>/dev/null | wc -l)
        if [ "$n_flac" -lt 1000 ]; then
            log "stage 8: corpus incomplete ($n_flac/1000 clips) — aborting stage"
            exit 1
        fi
    fi
    if timeout 7200 python train.py --config configs/corpus_rehearsal.json \
        > outputs/corpus_rehearsal_run.log 2>&1 \
       && python - <<'EOF'
import json, sys
want = json.load(open("configs/corpus_rehearsal.json"))["base"]["n_steps"]
last = 0
for line in open("outputs/corpus_rehearsal/logs/train_log.jsonl"):
    try: last = max(last, json.loads(line).get("step", 0))
    except Exception: pass
sys.exit(0 if last >= want - 1 else 1)
EOF
    then
        commit_globs "corpus rehearsal: 5k trainer-scale steps fed by the native FLAC loader" \
            "outputs/corpus_rehearsal/logs/train_log.jsonl" \
            "outputs/corpus_rehearsal_run.log" "outputs/corpus_flac_make.log"
        touch "$STAMPS/8_rehearsal"
    else
        log "stage 8: rehearsal train.py failed or log short — stamp NOT set"
    fi
fi

# ---- stage 5: frontier ch256 run ---------------------------------------
if [ ! -f "$STAMPS/5_frontier_done" ]; then
    log "stage 5: frontier ch256-s8 50k run"
    resume=""
    ls "$FRT"/checkpoints/*.msgpack >/dev/null 2>&1 && resume="--resume"
    run_supervised configs/imf_frontier_ch256.json "$FRT" /tmp/frontier.pid $resume
    touch "$STAMPS/5_frontier_done"
fi

# ---- stage 6: frontier evidence ----------------------------------------
if [ ! -f "$STAMPS/6_frontier_eval" ]; then
    log "stage 6: eval_suite on frontier"
    timeout 7200 python -m meanflow_audio_codec_tpu.tools.eval_suite \
        --workdir "$FRT" --label _step50k --family mixed --timing-runs 5
    commit_globs "frontier ch256 evidence: quality + warm timing (RTF) from one checkpoint" \
        "$FRT/evaluation_results_step50k*.json" \
        "$FRT/logs/train_log.jsonl" "$FRT/config.json"
    touch "$STAMPS/6_frontier_eval"
fi

log "chain complete"
