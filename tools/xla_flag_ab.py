"""XLA compiler-option A/B on the headline U-Net-256 train step (TPU).

The r4 MFU closure (MFU_CLOSURE.json) puts the step at 71.6 % of its
memory roofline with conv fusions at 65 % of MXU peak; every *model*-side
lever named by the per-op split has been A/B'd (maxpool VJP, BN kernel,
LN dtypes — all falsified).  The one untried class is XLA's own TPU
tuning knobs.

Environment finding (2026-08-21): ``XLA_FLAGS``-based TPU flags are a
dead end over the axon tunnel — the CLIENT's flag parser aborts on any
``--xla_tpu_*`` flag it doesn't know (``parse_flags_from_env.cc:234
Unknown flag``), because compilation happens server-side and the local
jaxlib only knows CPU-ish flags.  The working channel is
``jit(f).lower(...).compile(compiler_options={...})``, which ships the
options through PJRT to the server compiler; this tool uses that.

Measures the EXACT bench workload (``bench._unet_step_setup`` — the
same function object the resume-file workload hash pins) under each
candidate option set in fresh subprocesses, interleaved ABBA so tunnel
drift cancels, and prints a JSON verdict per candidate.  Adoption bar:
>2 % win on every rep (adoption would mean wiring the option into the
CLI's jit calls, so the bar is deliberately high).

Usage:  python tools/xla_flag_ab.py [--steps 20] [--reps 2]
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

#: candidate compiler_options dicts (server-side TPU compiler).  An
#: option the server rejects fails the child with rc!=0 and is recorded
#: as invalid instead of crashing the sweep.
CANDIDATES = {
    "baseline": {},
    # scoped-VMEM budget for fusion operands/results: larger lets the
    # conv-fusion tiler keep bigger tiles VMEM-resident (less HBM
    # re-streaming for the memory-bound fusions); too large starves
    # double-buffering.
    "scoped_vmem_96m": {"xla_tpu_scoped_vmem_limit_kib": "98304"},
    "scoped_vmem_48m": {"xla_tpu_scoped_vmem_limit_kib": "49152"},
}


def _child() -> None:
    import bench

    opts = json.loads(os.environ["XLA_AB_OPTS"]) or None
    step, carry, args = bench._unet_step_setup()
    n = int(os.environ.get("XLA_AB_STEPS", "20"))
    compiled = step.lower(*carry, *args).compile(compiler_options=opts)

    def run():
        nonlocal carry
        out = compiled(*carry, *args)
        carry = list(out[:-1])
        return out[-1]

    loss = run()
    bench._sync(loss)          # ensure compile+warmup complete
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
    order = []
    for r in range(reps):
        order += names if r % 2 == 0 else names[::-1]
    for name in order:
        env = dict(os.environ)
        env["XLA_AB_CHILD"] = "1"
        env["XLA_AB_OPTS"] = json.dumps(CANDIDATES[name])
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
        rec["options"] = CANDIDATES[name]
        results[name].append(rec)
        print(json.dumps({name: rec}), flush=True)
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
