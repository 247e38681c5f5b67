#!/bin/bash
# Sequential TPU session: measurements -> bench A/B -> full-size multiview.
cd /root/repo
echo "=== phase 1: kernel measurements ==="
python scripts/tpu_measure.py
echo "=== phase 2: bench.py conv A/B ==="
echo "--- conv impl = xla (round-1 baseline path) ---"
LEFTREFILL_CONV_IMPL=xla BENCH_ITERS=3 python bench.py
echo "--- conv impl = auto (pallas) ---"
LEFTREFILL_CONV_IMPL=auto BENCH_ITERS=3 python bench.py
echo "=== phase 3: full-size multiview ==="
python scripts/tpu_multiview_fullsize.py all
echo "=== ALL DONE ==="
