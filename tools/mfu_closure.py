"""MFU roofline closure for the conv-family headline steps.

Produces the Swin-style evidence (README "Performance" table) for
``unet256_train`` (~0.46 MFU) and ``pretrain224_train`` (~0.40 MFU):

* XLA cost analysis of the EXACT bench workload (same step builders —
  ``bench._unet_step_setup`` / ``bench._pretrain_step_setup``): FLOPs,
  bytes accessed, arithmetic intensity, and the roofline-predicted
  step time ``max(flops/peak, bytes/bw)`` vs the measured step time.
* A profiler-trace top-op split (total device-lane time per HLO op
  name, top 15) when ``jax.profiler.trace`` works over this host's
  TPU link — degrades to cost-analysis-only otherwise.

Writes ``MFU_CLOSURE.json`` at the repo root and prints a summary.
The reference publishes no perf numbers (SURVEY.md §6); the bar is
this repo's own matching-or-beating standard, so the deliverable is a
measured account of where the non-MXU time goes (hot loop being
accelerated: ``/root/reference/src/train_model.py:51-120``).

Run on the real chip: ``python tools/mfu_closure.py [unet pretrain]``.
Env: ``MFU_HBM_GBPS`` overrides the HBM bandwidth assumption
(default 819 GB/s, v5e), ``BENCH_*`` knobs as in bench.py.
"""
from __future__ import annotations

import glob
import gzip
import json
import os
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

import bench  # noqa: E402  (the workload definitions)

HBM_GBPS = float(os.environ.get("MFU_HBM_GBPS", "819"))


def _trace_split(trace_dir: str, steps: int, top_k: int = 15):
    """Aggregate device-lane op durations from a Chrome-trace dump.

    Returns ``{"device_ms_per_step", "categories": {...}, "top_ops"}``
    or None if no usable trace file was produced (e.g. profiling
    unsupported over the tunnel).  Each XLA-Ops-lane event carries
    ``hlo_category`` / ``model_flops`` / ``bytes_accessed``, so per
    category we report time share plus the *achieved* TF/s and GB/s —
    the numbers that say which roofline each category sits on."""
    files = glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"),
                      recursive=True)
    if not files:
        return None
    with gzip.open(sorted(files)[-1], "rt") as fh:
        events = json.load(fh).get("traceEvents", [])
    thread_names = {}
    for ev in events:
        if ev.get("ph") == "M" and ev.get("name") == "thread_name":
            thread_names[(ev["pid"], ev.get("tid"))] = \
                ev["args"].get("name", "")
    op_lanes = {k for k, n in thread_names.items() if n == "XLA Ops"}
    cats: dict = {}
    ops: dict = {}
    for ev in events:
        if ev.get("ph") != "X" or (ev.get("pid"),
                                   ev.get("tid")) not in op_lanes:
            continue
        args = ev.get("args", {})
        cat = args.get("hlo_category", "?")
        fl = float(args.get("model_flops", 0) or 0)
        by = float(args.get("bytes_accessed", 0) or 0)
        c = cats.setdefault(cat, [0.0, 0.0, 0.0])
        c[0] += ev.get("dur", 0.0)
        c[1] += fl
        c[2] += by
        # key ops by (name, category): an op name recurring across
        # categories must not be summed under its first-seen tag
        o = ops.setdefault((ev["name"], cat), [0.0])
        o[0] += ev.get("dur", 0.0)
    if not cats:
        return None
    total_us = sum(c[0] for c in cats.values())
    cat_rows = {}
    for cat, (us, fl, by) in sorted(cats.items(), key=lambda kv: -kv[1][0]):
        if us / total_us < 0.002:
            continue
        cat_rows[cat] = {
            "time_share": round(us / total_us, 4),
            "ms_per_step": round(us / steps / 1e3, 3),
            "achieved_tflops": round(fl / (us * 1e-6) / 1e12, 1)
            if us else None,
            "achieved_gbps": round(by / (us * 1e-6) / 1e9) if us else None,
        }
    top = sorted(ops.items(), key=lambda kv: -kv[1][0])[:top_k]
    return {
        "device_ms_per_step": round(total_us / steps / 1e3, 2),
        "categories": cat_rows,
        "top_ops": [(name, cat, round(us / steps / 1e3, 3),
                     round(us / total_us, 4))
                    for (name, cat), (us,) in top],
    }


def _closure(name: str, setup):
    step, carry, inputs = setup()
    # same AOT-compile + cost-analysis dance as bench._compile_with_flops
    # (which doesn't expose bytes), with the same graceful degradation:
    # a backend that refuses AOT or cost analysis still gets timed
    flops = byts = 0.0
    try:
        compiled = step.lower(*carry, *inputs).compile()
    except Exception:
        compiled = step
    try:
        cost = compiled.cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0]
        flops = float(cost.get("flops", 0.0))
        byts = float(cost.get("bytes accessed", 0.0))
    except Exception:
        pass
    peak = bench._peak_flops()
    bw = HBM_GBPS * 1e9

    def run():
        carry[0], carry[1], carry[2], loss = compiled(carry[0], carry[1],
                                                      carry[2], *inputs)
        return loss

    bench._sync(run())            # warm
    sec = bench._time_steps(run)

    # roofline: the step can't run faster than its FLOPs on the MXU nor
    # its HBM traffic on the memory system
    t_compute = flops / peak
    t_memory = byts / bw
    bound = "compute" if t_compute >= t_memory else "memory"
    t_roof = max(t_compute, t_memory)

    trace_top = None
    try:
        import tempfile

        import jax
        n_traced = 3
        tdir = tempfile.mkdtemp(prefix=f"mfu_trace_{name}_")
        with jax.profiler.trace(tdir):
            for _ in range(n_traced):
                out = run()
            bench._sync(out)
        trace_top = _trace_split(tdir, steps=n_traced)
    except Exception as exc:  # profiling over the tunnel may not work
        trace_top = f"unavailable: {type(exc).__name__}: {exc}"

    result = {
        "sec_per_step": round(sec, 5),
        "flops_per_step": flops,
        "bytes_per_step": byts,
        "arith_intensity_flop_per_byte": round(flops / byts, 1)
        if byts else None,
        "ridge_flop_per_byte": round(peak / bw, 1),
        "mfu": round(flops / sec / peak, 4),
        "hbm_util": round(byts / sec / bw, 4),
        "roofline": {
            "t_compute_s": round(t_compute, 5),
            "t_memory_s": round(t_memory, 5),
            "bound": bound,
            "t_roofline_s": round(t_roof, 5),
            "achieved_frac_of_roofline": round(t_roof / sec, 4),
        },
        "profiler_split": trace_top,
        "assumptions": {"peak_flops": peak, "hbm_gbps": HBM_GBPS,
                        "note": "cost-analysis bytes are an UPPER BOUND "
                                "on HBM traffic (operand bytes per op; "
                                "no VMEM-residency credit)"},
    }
    print(json.dumps({name: result}, indent=1))
    return result


def _swin_step_setup(train: bool):
    """Mirror of bench.bench_swin224's workload (NOT a refactor of it:
    bench's per-metric workload hashes pin that function's source, and
    editing it would invalidate captured resume entries).  Keep in sync
    with bench.py if the swin bench workload ever changes."""
    import functools

    import jax
    import jax.numpy as jnp
    import optax

    from medsegpretrainimagenet_tpu.models.blocks import set_compute_dtype

    if os.environ.get("BENCH_MP", "1") == "1":
        set_compute_dtype(jnp.bfloat16)
    size = 224
    module = bench._swin_module(size)
    x = jnp.zeros((bench.SWIN_BATCH, size, size, 3), jnp.bfloat16)
    y = jnp.zeros((bench.SWIN_BATCH, size, size), jnp.float32)
    variables = module.init(jax.random.key(0), x, train=False)
    params = variables["params"]
    if not train:
        @jax.jit
        def fwd(params, a, b, x, y):
            del y
            # carry-compatible wrapper: (params, dummy, dummy, pred) so
            # _closure's 4-way unpack works; the pred readback at sync
            # time matches bench_swin224's eval run() semantics
            return params, a, b, module.apply({"params": params}, x,
                                              train=False)

        return fwd, [params, jnp.zeros(()), jnp.zeros(())], (x, y)

    tx = optax.sgd(1e-3, momentum=0.9)
    opt_state = tx.init(params)
    rng = jax.random.key(1)

    def loss_fn(params, x, y, rng):
        pred = module.apply({"params": params}, x, train=True,
                            rngs={"dropout": rng})
        pred = pred[..., 0].astype(jnp.float32)
        eps = 1e-5
        inter = jnp.sum(pred * y)
        return 1 - (2 * inter + eps) / (jnp.sum(y) + jnp.sum(pred ** 2)
                                        + eps)

    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def step(params, opt_state, rngc, x, y):
        loss, grads = jax.value_and_grad(loss_fn)(params, x, y, rngc[0])
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, rngc, loss

    return step, [params, opt_state, (rng,)], (x, y)


def main():
    which = [a for a in sys.argv[1:] if not a.startswith("-")] or \
        ["unet", "pretrain"]
    out = {"measured_at": time.strftime("%Y-%m-%dT%H:%M:%S", time.gmtime()),
           "code_rev": bench._git_rev(),
           "device": None, "workloads": {}}
    import jax
    out["device"] = jax.devices()[0].device_kind
    if "unet" in which:
        out["workloads"]["unet256_train"] = _closure(
            "unet256_train", bench._unet_step_setup)
    if "pretrain" in which:
        out["workloads"]["pretrain224_train"] = _closure(
            "pretrain224_train", bench._pretrain_step_setup)
    if "swin" in which:
        out["workloads"]["swin224_train"] = _closure(
            "swin224_train", lambda: _swin_step_setup(train=True))
    if "swin_eval" in which:
        out["workloads"]["swin224_eval"] = _closure(
            "swin224_eval", lambda: _swin_step_setup(train=False))
    # per-workload provenance: a later partial run (different rev/chip)
    # must not let the top-level stamp misattribute carried-over entries
    prov = {"measured_at": out["measured_at"], "code_rev": out["code_rev"],
            "device": out["device"]}
    for wl in out["workloads"].values():
        if isinstance(wl, dict):
            wl["provenance"] = dict(prov)
    path = os.path.join(HERE, "MFU_CLOSURE.json")
    # merge: a partial run (e.g. `mfu_closure.py swin`) must not drop
    # previously measured workloads; entries from pre-provenance files
    # inherit THEIR OWN file's top-level stamp, not this run's
    try:
        with open(path) as fh:
            old = json.load(fh)
        old_prov = {"measured_at": old.get("measured_at"),
                    "code_rev": old.get("code_rev"),
                    "device": old.get("device")}
        merged = {}
        for name, wl in old.get("workloads", {}).items():
            if isinstance(wl, dict) and "provenance" not in wl:
                wl = {**wl, "provenance": dict(old_prov)}
            merged[name] = wl
    except (OSError, ValueError):
        merged = {}
    merged.update(out["workloads"])
    out["workloads"] = merged
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    print("wrote", path)


if __name__ == "__main__":
    main()
