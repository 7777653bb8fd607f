"""Benchmark driver: prints ONE JSON line per metric (headline first+last).

Metric (BASELINE.json): output tokens/sec/chip on a LLaMA-160M-class model
(config #1), bf16, continuous batching through the full RequestManager with
pipelined horizon decoding. ``vs_baseline`` reports against the round-1
recorded figure (1917.8 tok/s, pre-pipelining) so later rounds show real
engine-level speedups; the >=1.5x speculative gate (bench_spec.py) runs at
the BASELINE 7B INT8/INT4 configs.

Capture robustness (VERDICT r2 #1): every phase runs in its OWN subprocess
with a hard wall-clock budget, killed by process group on overrun, so a
wedged tunnel or a hanging 7B compile can never cost the headline — and the
TPU client is fully released between phases. A backend-health probe (with
retry) runs first so a wedged backend fails fast with a diagnostic instead
of hanging the driver. Env knobs:

- FF_BENCH_SPEC=0            skip the 7B spec phase entirely
- FF_BENCH_SPEC_TIMEOUT=sec  budget for the 7B phase   (default 2700)
- FF_BENCH_HEADLINE_TIMEOUT  budget for the 160M phase (default 1800)
- FF_BENCH_PROBE_TIMEOUT     per-attempt probe budget  (default 600)
- FF_BENCH_PROBE_ATTEMPTS    probe retries             (default 2)
"""

import json
import os
import signal
import subprocess
import sys
import time

_METRIC_PREFIX = '{"metric"'


def _log(msg):
    print(f"[bench {time.strftime('%H:%M:%S')}] {msg}", file=sys.stderr,
          flush=True)


def _run_phase(cmd, timeout_s, name):
    """Run one bench phase in its own process group with a hard budget.

    Forwards the child's metric lines (stdout) to our stdout and everything
    else to stderr; on overrun kills the exact process group we started
    (never by pattern). Returns the list of metric JSON lines captured."""
    import tempfile

    _log(f"phase {name}: {' '.join(cmd)} (budget {timeout_s}s)")
    t0 = time.perf_counter()
    # stdout goes to a temp file (not a pipe) so metrics the child printed
    # BEFORE a budget kill still get captured and forwarded
    with tempfile.TemporaryFile(mode="w+") as outf:
        proc = subprocess.Popen(
            cmd, stdout=outf, stderr=sys.stderr,
            start_new_session=True, text=True, cwd=os.path.dirname(
                os.path.abspath(__file__)),
        )
        try:
            proc.wait(timeout=timeout_s)
        except subprocess.TimeoutExpired:
            _log(f"phase {name}: BUDGET EXCEEDED after {timeout_s}s — "
                 f"killing pgid {proc.pid}")
            try:
                os.killpg(proc.pid, signal.SIGKILL)
            except ProcessLookupError:
                pass
            proc.wait()
        outf.seek(0)
        out = outf.read()
    metrics = []
    for line in (out or "").splitlines():
        if line.startswith(_METRIC_PREFIX):
            print(line, flush=True)
            metrics.append(line)
        elif line.strip():
            print(line, file=sys.stderr, flush=True)
    _log(f"phase {name}: rc={proc.returncode} "
         f"({time.perf_counter() - t0:.0f}s, {len(metrics)} metrics)")
    return metrics


def _probe_backend():
    """Fail fast (with retry) if the TPU backend is wedged/unreachable."""
    budget = int(os.environ.get("FF_BENCH_PROBE_TIMEOUT", "600"))
    attempts = int(os.environ.get("FF_BENCH_PROBE_ATTEMPTS", "2"))
    code = ("import jax, jax.numpy as jnp; "
            "x = jnp.ones((128,128), jnp.bfloat16); "
            "print('probe ok', (x@x).sum(), jax.devices())")
    for attempt in range(attempts):
        _log(f"backend probe attempt {attempt + 1}/{attempts}")
        proc = subprocess.Popen(
            [sys.executable, "-c", code], start_new_session=True,
            stdout=sys.stderr, stderr=sys.stderr,
        )
        try:
            rc = proc.wait(timeout=budget)
        except subprocess.TimeoutExpired:
            try:
                os.killpg(proc.pid, signal.SIGKILL)
            except ProcessLookupError:
                pass
            proc.wait()
            rc = -9
        if rc == 0:
            return True
        _log(f"probe failed (rc={rc}); retrying in 60s")
        time.sleep(60)
    return False


def main():
    if not _probe_backend():
        _log("TPU backend unavailable — aborting capture (wedged tunnel: "
             "device init hangs; see /tmp/tpu_health.log pattern from r3)")
        sys.exit(2)

    headline_budget = int(os.environ.get("FF_BENCH_HEADLINE_TIMEOUT", "1800"))
    headline = _run_phase(
        [sys.executable, "bench_headline.py"], headline_budget, "headline"
    )

    if os.environ.get("FF_BENCH_SPEC", "1") != "0":
        spec_budget = int(os.environ.get("FF_BENCH_SPEC_TIMEOUT", "2700"))
        _run_phase([sys.executable, "bench_spec.py"], spec_budget, "spec7b")
    else:
        _log("FF_BENCH_SPEC=0: skipping the 7B spec phase")

    if os.environ.get("FF_BENCH_MQA", "1") != "0":
        mqa_budget = int(os.environ.get("FF_BENCH_MQA_TIMEOUT", "1500"))
        _run_phase([sys.executable, "bench_mqa.py"], mqa_budget, "mqa")
    else:
        _log("FF_BENCH_MQA=0: skipping the MQA phase")

    if os.environ.get("FF_BENCH_70B", "1") != "0":
        b70_budget = int(os.environ.get("FF_BENCH_70B_TIMEOUT", "1200"))
        _run_phase([sys.executable, "bench_70b.py"], b70_budget, "70b-slice")
    else:
        _log("FF_BENCH_70B=0: skipping the 70B width-slice phase")

    # repeat the headline LAST so a last-line parser sees the round-1 metric
    for line in headline:
        try:
            if json.loads(line).get("metric", "").startswith("llama160m"):
                print(line, flush=True)
        except json.JSONDecodeError:
            pass


if __name__ == "__main__":
    main()
