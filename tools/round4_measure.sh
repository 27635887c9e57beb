#!/bin/bash
# Round-4 on-chip measurement chain (run with the chip otherwise idle).
# Each step appends to $LOG; JSON artifacts land in docs/ and /tmp.
set -x
cd /root/repo
PY=${PY:-python}
LOG=/tmp/round4_measure.log

# 1. End-to-end full-scale with epoch groups (exact + cached):
#    the round-3 judge's >=80%-of-window target.
$PY -m mimrl_tpu.tools.parity --synthetic --allow_hermetic --full_scale \
    --light_artifacts --epoch_group 8 --task_name fs_group_exact \
    --out docs/FULL_SCALE_exact.json
$PY -m mimrl_tpu.tools.parity --synthetic --allow_hermetic --full_scale \
    --light_artifacts --epoch_group 8 --stage1_cached \
    --task_name fs_group_cached --out docs/FULL_SCALE_cached.json

# 2. Headline bench, twice (ratio stability +-5% across consecutive runs)
$PY bench.py > /tmp/bench_r4_run1.json 2>/tmp/bench_r4_run1.err
$PY bench.py > /tmp/bench_r4_run2.json 2>/tmp/bench_r4_run2.err

# 3. Second + third operating points
BENCH_SHAPES=mosei $PY bench.py > /tmp/bench_r4_mosei.json 2>/tmp/bench_mosei.err
BENCH_SHAPES=avec $PY bench.py > /tmp/bench_r4_avec.json 2>/tmp/bench_avec.err

# 4. Knob sweep at MOSEI shapes (verify/retire the "remat wins at larger
#    shapes" hypothesis)
BENCH_SHAPES=mosei $PY tools/knob_sweep.py > /tmp/knob_sweep_mosei.json 2>/tmp/knob_mosei.err

# 5. MOSEI-scale convergence runs (seed study skips the finished MOSI
#    runs and adds mosei exact+cached, then rewrites the summary)
$PY tools/seed_study.py --seeds 0 1 2 --mosei --out docs/SEED_STUDY.json \
    >> /tmp/seed_study.log 2>&1

echo DONE
