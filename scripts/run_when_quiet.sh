#!/bin/bash
# Gate a benchmark run on host quiescence: poll the single-thread CPU canary
# and start the command only after two consecutive clean probes (< $2 s,
# default 0.09). Guards against the host's intermittent invisible
# contention (see OPTIMIZATION_r11.md "Measurement protocol").
# Usage: run_when_quiet.sh '<command>' [threshold_s] [max_wait_s]
set -u
CMD="$1"
THRESH="${2:-0.09}"
MAX_WAIT="${3:-3600}"
waited=0
clean=0
while [ "$waited" -lt "$MAX_WAIT" ]; do
  t=$(python - <<'EOF'
import time
import numpy as np
rng = np.random.default_rng(42)
a = rng.standard_normal((512, 512))
runs = []
for _ in range(3):
    t0 = time.perf_counter()
    b = a
    for _ in range(20):
        b = b @ a
        b /= np.abs(b).max()
    runs.append(time.perf_counter() - t0)
print(f"{min(runs):.4f}")
EOF
)
  echo "canary=$t (clean streak: $clean)" >&2
  if python -c "import sys; sys.exit(0 if float('$t') < float('$THRESH') else 1)"; then
    clean=$((clean + 1))
    if [ "$clean" -ge 2 ]; then
      echo "host quiet; running: $CMD" >&2
      exec bash -c "$CMD"
    fi
  else
    clean=0
  fi
  sleep 60
  waited=$((waited + 60))
done
echo "host never went quiet within ${MAX_WAIT}s; running anyway: $CMD" >&2
exec bash -c "$CMD"
