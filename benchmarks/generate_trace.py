
#!/usr/bin/env python
"""Request-trace generator (mirror of reference
/root/reference/rdelacou/generate_trace.py — Poisson arrivals with realistic
prompt/output length distributions; the reference samples Azure LLM inference
timestamps + ShareGPT lengths, we synthesize from the same family of
distributions since the environment has no dataset egress)."""

from __future__ import annotations

import os as _os, sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))  # runnable directly

import argparse
import json

import numpy as np


def generate_trace(
    *,
    arrival_rate: float = 1.0,  # requests/sec
    duration_s: float = 60.0,
    prompt_len_mean: float = 128.0,
    output_len_mean: float = 96.0,
    max_len: int = 1024,
    seed: int = 0,
):
    rng = np.random.RandomState(seed)
    t, entries = 0.0, []
    while t < duration_s:
        t += rng.exponential(1.0 / arrival_rate)
        if t >= duration_s:
            break
        prompt_len = int(np.clip(rng.lognormal(np.log(prompt_len_mean), 0.6),
                                 4, max_len // 2))
        output_len = int(np.clip(rng.lognormal(np.log(output_len_mean), 0.6),
                                 4, max_len // 2))
        entries.append({
            "arrival_s": round(t, 4),
            "prompt_len": prompt_len,
            "output_len": output_len,
        })
    return entries


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--arrival-rate", type=float, default=1.0)
    p.add_argument("--duration", type=float, default=60.0)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("-o", "--output", default="trace.json")
    args = p.parse_args()
    trace = generate_trace(arrival_rate=args.arrival_rate,
                           duration_s=args.duration, seed=args.seed)
    with open(args.output, "w") as f:
        json.dump(trace, f)
    print(f"wrote {len(trace)} requests to {args.output}")


if __name__ == "__main__":
    main()
