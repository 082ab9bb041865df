#!/usr/bin/env bash
# One-command replica of every local gate, in the order that fails
# fastest: registry pins (1 s), full pytest (~4 min), sf0.01 oracle
# sweep (~15 min), FULL-REGISTRY driver-gate replica under typed
# Arrow-fetch semantics (~15 min — the r9 lesson: check_oracle's str()
# compare cannot see what the driver's typed fetch sees, so every
# registry entry must also pass the replica), the independent
# from-scratch comparator (r12: standing tier, ~15 min), sf0.1 batched
# scale sweep (~25 min), bench.
# Usage: bash tools/gate.sh [--quick|--full]
#   --quick  stops after the sf0.01 typed replica
#   --full   additionally runs the r11 big-tier battery: hostile
#            no-NaN sweep, sf1.0 str sweep + typed replica
#            (regenerates testdata_big/sf1.0 if absent; ~2 h extra).
#            Sweeps run SEQUENTIALLY — see docs/BENCH_NOTES.md r11 for
#            the concurrent-spill caveat the per-pid temp dirs close.
set -euo pipefail
cd "$(dirname "$0")/.."
python -m pytest tests/test_registry.py -q
python tools/lint_oracle_types.py
python -m pytest tests/ -x -q
python tools/check_oracle.py /root/testdata/sf0.01
python tools/driver_gate_replica.py /root/testdata/sf0.01 220 docs/GATE_REPLICA_full.json
# Independent from-scratch comparator (zero shared code with the two
# tools above; tests/test_indep_check.py pins that) — a comparator bug
# in the standing family would have to be reproduced here to hide.
python tools/indep_check.py /root/testdata/sf0.01 | tee docs/INDEP_SWEEP.txt
if [[ "${1:-}" != "--quick" ]]; then
    python tools/scale_sweep.py
    if [[ "${1:-}" == "--full" ]]; then
        python tools/hostile_data_sweep.py testdata_hostile_nonan
        [[ -d testdata_big/sf1.0 ]] || python tools/make_scale_data.py
        python tools/scale_sweep.py "$PWD/testdata_big/sf1.0"
        python tools/typed_scale_sweep.py "$PWD/testdata_big/sf1.0" docs/GATE_REPLICA_sf1.0.json
    fi
    python bench.py
fi
echo "ALL GATES GREEN"
