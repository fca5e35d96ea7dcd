"""Roofline fractions for EVERY BASELINE.json rung (VERDICT round-2 item 6:
"no blank roofline cells") — measures img/s + XLA-cost-model FLOPs for each
trainer family at its headline config, on the real chip.  Thin CLI over
``uig.metrics.perf_rungs`` (the same library bench.py's all-rungs array
uses, so manual sessions and driver artifacts can't drift).

Run: PYTHONPATH=src:$PYTHONPATH python -u scripts/perf_rungs.py [names...]
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", "src"))

from uig.metrics.perf_rungs import RUNGS, measure_rung  # noqa: E402

if __name__ == "__main__":
    names = sys.argv[1:] or list(RUNGS)
    for n in names:
        try:
            r = measure_rung(n)
            print(f"{n:<14s} {r['ms_step']:7.1f} ms/step  "
                  f"{r['img_s']:6.1f} img/s  {r['tf_step']:6.2f} TF/step  "
                  f"roofline {r['roofline']:.3f}"
                  + (f"  [{r['note']}]" if "note" in r else ""), flush=True)
        except Exception as e:
            print(f"{n:<14s} FAILED: {type(e).__name__}: {e}", flush=True)
