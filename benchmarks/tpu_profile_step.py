"""TPU: jax.profiler device-trace decomposition of the fused vanilla step.

Traces ONE lax.scan dispatch of SCAN_STEPS train steps (the bench.py
dispatch shape), then parses the Chrome-trace JSON the profiler writes and
prints the per-step device-time decomposition: time inside each Pallas
render kernel, XLA glue (pads/copies/sample_pdf/sort/Adam fusions), and
inter-op idle. Device-side tracing DOES work through the axon tunnel
(the /device:TPU:0 lane carries real XLA-op slices).

Round-3 recorded result (50-step scan, lego shapes, rc16/rf8):
430.4 ms dispatch = 8.61 ms/step, of which fine render kernel 5.89 ms +
coarse render kernel 1.90 ms = 90.6%; all other XLA ops 0.78 ms (9.3%;
top: pad 0.154, copy 0.155, broadcast_select 0.134, sample_pdf custom
call 0.038, z-union sort 0.038, Adam fusions ~0.1); total inter-op GAP
0.33 ms over the whole 430 ms dispatch (0.08%) — the device never idles
inside the dispatch, so the throughput plateau lives INSIDE the Mosaic
kernels (their internal MXU/VPU mix), not in scheduling around them.

The trace's actionable item (the aux stack->pad chain) was rewritten as
a column concat for +3.6% (PERFORMANCE.md); the post-adoption re-run
shows glue down 0.80 -> 0.49 ms/step with kernels unchanged — the
largest residue is a 0.155 ms [P,3] layout copy under the dists chain
(pad_maximum -> T(8,128) relayout), i.e. ~1.8% of the step, the last
out-of-kernel morsel.

Writes the trace under /tmp/prof_scan_trace and a JSON summary to
/tmp/tpu_profile_step.json.
"""

from __future__ import annotations

import collections
import glob
import gzip
import json
import shutil
import sys

sys.path.insert(0, "/root/repo")

import jax

SCAN_STEPS = 50
TRACE_DIR = "/tmp/prof_scan_trace"


def capture():
    from benchmarks.tpu_pdf_merge_ab import rays_of
    from swnerf_tpu.models.vanilla import VanillaNeRFConfig, make_vanilla_field
    from swnerf_tpu.render import RenderConfig
    from swnerf_tpu.train import make_optimizer
    from swnerf_tpu.train.fused_step import make_fused_train_step
    from swnerf_tpu.train.loop import init_train_state

    cfg = VanillaNeRFConfig()
    rcfg = RenderConfig(n_samples=64, n_importance=128, perturb=1.0,
                        white_bkgd=True, raw_noise_std=1.0)
    opt = make_optimizer()
    field = make_vanilla_field(cfg, fused=False)
    params = {"coarse": field.init(jax.random.PRNGKey(0)),
              "fine": field.init(jax.random.PRNGKey(1))}
    rays, target = rays_of(1024)
    step = make_fused_train_step(cfg, rcfg, opt)
    state = init_train_state(params, opt)
    key = jax.random.PRNGKey(0)

    def run(c):
        def body(c, _):
            c, _aux = step(c, rays, target, key)
            return c, 0.0

        c, _ = jax.lax.scan(body, c, None, length=SCAN_STEPS)
        return c

    fn = jax.jit(run)
    state = fn(state)  # compile + warm
    jax.block_until_ready(jax.tree.leaves(state.params)[0])
    shutil.rmtree(TRACE_DIR, ignore_errors=True)
    jax.profiler.start_trace(TRACE_DIR)
    state = fn(state)
    jax.block_until_ready(jax.tree.leaves(state.params)[0])
    jax.profiler.stop_trace()


def analyze():
    paths = glob.glob(f"{TRACE_DIR}/plugins/profile/*/*.trace.json.gz")
    assert paths, f"no trace under {TRACE_DIR}"
    with gzip.open(sorted(paths)[-1]) as f:
        d = json.load(f)
    ev = d["traceEvents"]
    tids = {
        e["tid"]: e["args"]["name"]
        for e in ev
        if e.get("ph") == "M" and e.get("name") == "thread_name"
        and e.get("pid") == 3
    }
    ops = [
        e for e in ev
        if e.get("pid") == 3 and e.get("ph") == "X"
        and tids.get(e["tid"]) == "XLA Ops"
        and not e["name"].startswith("while")  # the scan wrapper double-counts
    ]
    span = (max(e["ts"] + e["dur"] for e in ops) - min(e["ts"] for e in ops))
    agg = collections.Counter()
    for e in ops:
        agg[e["name"]] += e["dur"]
    kernels = {n: v for n, v in agg.items() if "_render_pass_call" in n}
    kern = sum(kernels.values())
    busy = sum(agg.values())
    ops.sort(key=lambda e: e["ts"])
    gap = sum(
        max(0, b["ts"] - (a["ts"] + a["dur"])) for a, b in zip(ops, ops[1:])
    )
    out = {
        "dispatch_ms": span / 1e3,
        "ms_per_step": span / 1e3 / SCAN_STEPS,
        "render_kernels_ms_per_step": kern / 1e3 / SCAN_STEPS,
        "render_kernel_share": kern / span,
        "per_kernel_ms_per_step": {
            n: v / 1e3 / SCAN_STEPS for n, v in kernels.items()
        },
        "glue_ms_per_step": (busy - kern) / 1e3 / SCAN_STEPS,
        "interop_gap_ms_total": gap / 1e3,
        "top_glue": [
            (n, round(v / 1e3 / SCAN_STEPS, 4))
            for n, v in agg.most_common(12)
            if "_render_pass_call" not in n
        ][:8],
    }
    print(json.dumps(out, indent=2))
    with open("/tmp/tpu_profile_step.json", "w") as f:
        json.dump(out, f, indent=2)


if __name__ == "__main__":
    capture()
    analyze()
