"""XLA-flag A/B on the headline U-Net-256 train step (real TPU).

The r4 MFU closure (MFU_CLOSURE.json) puts the step at 71.6 % of its
memory roofline with conv fusions at 65 % of MXU peak; every *model*-side
lever named by the per-op split has been A/B'd (maxpool VJP, BN kernel,
LN dtypes — all falsified).  The one untried class is XLA's own TPU
tuning flags.  This tool measures the EXACT bench workload
(``bench._unet_step_setup`` — same function object the resume-file
workload hash pins) under candidate ``XLA_FLAGS`` settings in fresh
subprocesses, interleaved ABBA to de-noise tunnel drift, and prints a
JSON verdict per flag.

Usage:  python tools/xla_flag_ab.py            # default candidate set
        python tools/xla_flag_ab.py --steps 30 --reps 2
        CHILD mode (internal): XLA_AB_CHILD=1

A flag is only worth adopting if it wins by >2 % on both of its ABBA
reps; adoption means exporting it from the CLI entry point, so the bar
is deliberately high.
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
REPO = os.path.dirname(HERE)
sys.path.insert(0, REPO)

#: candidate XLA_FLAGS values (appended to any inherited flags).  Only
#: flags that exist on this jaxlib's libtpu are listed — an unknown
#: --xla_* flag aborts backend init, which the child reports as rc!=0
#: and the parent records as "invalid" instead of crashing the sweep.
CANDIDATES = {
    "baseline": "",
    # scoped-VMEM budget for fusion operands/results: larger scoped vmem
    # lets the conv-fusion tiler keep bigger operand tiles VMEM-resident
    # (less HBM re-streaming for the memory-bound fusions); too large
    # starves double-buffering.  v5e default is 64 MiB-class.
    "scoped_vmem_96m": "--xla_tpu_scoped_vmem_limit_kib=98304",
    "scoped_vmem_48m": "--xla_tpu_scoped_vmem_limit_kib=49152",
}


def _child() -> None:
    import bench

    step, carry, args = bench._unet_step_setup()
    n = int(os.environ.get("XLA_AB_STEPS", "20"))

    def run():
        nonlocal carry
        out = step(*carry, *args)
        carry = list(out[:-1])
        return out[-1]

    loss = run()
    bench._sync(loss)          # warmup + compile
    t0 = time.time()
    for _ in range(n):
        loss = run()
    bench._sync(loss)
    sec = (time.time() - t0) / n
    print(json.dumps({"sec_per_step": sec,
                      "images_per_sec": bench.BATCH / sec}))


def main() -> int:
    argv = sys.argv[1:]
    steps = int(argv[argv.index("--steps") + 1]) if "--steps" in argv \
        else 20
    reps = int(argv[argv.index("--reps") + 1]) if "--reps" in argv else 2
    names = list(CANDIDATES)
    results: dict[str, list] = {n: [] for n in names}
    # ABBA: forward order then reversed, `reps` times over
    order = []
    for r in range(reps):
        order += names if r % 2 == 0 else names[::-1]
    for name in order:
        env = dict(os.environ)
        flags = (env.get("XLA_FLAGS", "") + " " + CANDIDATES[name]).strip()
        if flags:
            env["XLA_FLAGS"] = flags
        env["XLA_AB_CHILD"] = "1"
        env["XLA_AB_STEPS"] = str(steps)
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env, cwd=REPO, capture_output=True, text=True,
            timeout=900)
        line = proc.stdout.strip().splitlines()[-1] if proc.stdout.strip() \
            else ""
        try:
            rec = json.loads(line)
        except ValueError:
            rec = {"error": f"rc={proc.returncode}",
                   "stderr_tail": proc.stderr[-300:]}
        rec["flag"] = CANDIDATES[name]
        results[name].append(rec)
        print(json.dumps({name: rec}), flush=True)
    # verdict vs baseline: compare per-rep (ABBA pairs share a window)
    base = [r.get("images_per_sec") for r in results["baseline"]]
    verdict = {}
    for name in names:
        if name == "baseline":
            continue
        gains = []
        for i, rec in enumerate(results[name]):
            if rec.get("images_per_sec") and i < len(base) and base[i]:
                gains.append(rec["images_per_sec"] / base[i] - 1)
        verdict[name] = {
            "gains_vs_baseline": [round(g, 4) for g in gains],
            "adopt": bool(gains) and all(g > 0.02 for g in gains),
        }
    print(json.dumps({"verdict": verdict,
                      "baseline_images_per_sec": base}))
    return 0


if __name__ == "__main__":
    if os.environ.get("XLA_AB_CHILD") == "1":
        _child()
    else:
        sys.exit(main())
