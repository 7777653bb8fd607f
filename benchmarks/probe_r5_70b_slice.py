"""Round-5 probe: EXECUTE 70B geometry on the real chip (VERDICT #4a).

Superseded by the driver-captured bench phase (bench_70b.py) — this probe
now simply invokes it. History: the first version built the whole 4-layer
bf16 tree (~8 GB) before quantizing and OOMed the 16 GB chip, which is
itself a datapoint the shape-only fit test could never produce; the bench
streams leaf-by-leaf (see bench_70b._init_quantized_streaming).

    python -u benchmarks/probe_r5_70b_slice.py
"""

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

from bench_70b import run_70b_slice

if __name__ == "__main__":
    run_70b_slice()
