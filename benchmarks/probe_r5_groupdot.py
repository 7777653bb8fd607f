"""Round-5 lab note: the INT4 group-dot kernel's ship-or-delete trial.

RESULTS RECORDED (on-chip 2026-08-22, before the kernel's deletion; this
file is the documentation of the decision — the executable probe targeted
the ``groupdot=`` kernel variant that no longer exists, see git history
for the runnable version at commit c8f2915^):

1. Compile matrix (scoped-VMEM feasibility at 7B serving units x rows
   8/16/104): every unit compiled at block_f 512 EXCEPT wd
   [104,11008]x[11008,4096], which OOMed scoped VMEM at every block_f
   (analytic estimate 15.1 MB vs the 16 MB limit; Mosaic allocates ~2x the
   analytic f32 partials). Calibration: 5.7 MB analytic fits, 15.1 fails.
2. Row-determinism: rows 0..7 of a [104, d] call BITWISE-identical to the
   [8, d] call; blocking-independent across block_f 512 vs 128. The
   invariant held — it was not the reason to delete.
3. Timing: group-dot won isolated GEMV micros (lm_head b=8: 69 vs 115 us)
   but was 5-10x SLOWER at tree-verify row counts (wqkv r104: ~429 us vs
   the prod kernel's single-digit differential) — and the spec-lossless
   invariant forces decode and verify onto the SAME kernel per unit.
4. End-to-end decode at 7B INT4 B=8: groupdot ON 15.47 ms/step vs prod
   14.68 — an e2e LOSS.

Decision: kernel DELETED (VERDICT r4 #2b offered ship-or-delete);
rationale also recorded in ops/pallas/quant_matmul.py's module docstring.
"""
