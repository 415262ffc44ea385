"""TPU: why does the fused trunk FORWARD chain sit at ~41-45% of the MXU
roof while the reverse sweep reaches ~87%?

Hypothesis (PERFORMANCE.md round-3 decomposition): Mosaic schedules the
traced op order without overlapping independent MXU/VPU work, so a
forward layer = 1 matmul + k elementwise VPU passes (bias add f32, relu
f32, cast->bf16) serializes MXU and VPU; the backward's three matmuls per
layer keep the MXU busy between its single act-grad VPU pass. If true,
utilization ~= t_mxu / (t_mxu + k * t_vpu_pass), and cutting k is the
lever the tile/remat/stride sweeps could never reach.

Variants (pure D=8 W=256 layer chain, no skip/heads, weights VMEM-resident,
grid over row tiles exactly like render_fused's trunk):
  A. product form:  f32 matmul out + bias(f32) + relu(f32) + cast(bf16)
  B. bf16-out matmul + bias(bf16) + relu(bf16)      [no cast pass]
  C. bf16-out matmul + fused max(z*1+b, 0) as one expr in bf16
  D. matmul chain only, cast between                [no bias/relu at all]
  E. matmul chain bf16-out, nothing else            [pure MXU floor]

Roof math: row = 8 x 256x256 matmuls = 1.048 MFLOP; P rows total.
"""

from __future__ import annotations

import functools
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

STEPS = 150
D, W = 8, 256
results = {}


def _chain_kernel(x_ref, *refs, variant: str, d: int, interleave: int = 1):
    w_refs = refs[:d]
    b_refs = refs[d:2 * d]
    out_ref = refs[2 * d]
    h = x_ref[:]
    if interleave > 1:
        # ILP probe: `interleave` FULL-WIDTH independent chains in one kernel
        # body. Chain j's layer i+1 depends only on chain j's layer i, so the
        # scheduler may overlap chain k's matmul with chain j's drain/VPU —
        # if the ~56% single-chain ceiling is inter-matmul pipeline latency,
        # this lifts it; if it is issue-bandwidth, it won't. (The round-3
        # first attempt halved the layer WIDTH per chain, which changes the
        # MXU tile shape and confounded the answer.)
        B = h.shape[0] // interleave
        hs = [h[j * B:(j + 1) * B] for j in range(interleave)]
        for i in range(d):
            w = w_refs[i][:]
            b = b_refs[i][:]
            zs = [jnp.dot(hj, w, preferred_element_type=jnp.float32) for hj in hs]
            hs = [jnp.maximum(z + b, 0.0).astype(jnp.bfloat16) for z in zs]
        out_ref[:] = jnp.concatenate(hs, axis=0).astype(jnp.float32)
        return
    for i in range(d):
        w = w_refs[i][:]
        b = b_refs[i][:]
        if variant == "A":
            z = jnp.dot(h, w, preferred_element_type=jnp.float32)
            h = jnp.maximum(z + b, 0.0).astype(jnp.bfloat16)
        elif variant == "B":
            z = jnp.dot(h, w, preferred_element_type=jnp.bfloat16)
            h = jnp.maximum(z + b.astype(jnp.bfloat16), jnp.bfloat16(0.0))
        elif variant == "C":
            z = jnp.dot(h, w, preferred_element_type=jnp.bfloat16)
            h = jnp.maximum(z, -b.astype(jnp.bfloat16)) + b.astype(jnp.bfloat16)
        elif variant == "D":
            z = jnp.dot(h, w, preferred_element_type=jnp.float32)
            h = z.astype(jnp.bfloat16)
        else:  # E
            h = jnp.dot(h, w, preferred_element_type=jnp.bfloat16)
    out_ref[:] = h.astype(jnp.float32)


def make_chain(P: int, B: int, variant: str, interleave: int = 1):
    n_tiles = P // B
    row_spec = pl.BlockSpec((B, W), lambda i: (i, 0), memory_space=pltpu.VMEM)
    const = lambda shape: pl.BlockSpec(shape, lambda i: (0, 0), memory_space=pltpu.VMEM)

    def call(x, ws, bs):
        return pl.pallas_call(
            functools.partial(_chain_kernel, variant=variant, d=D,
                              interleave=interleave),
            out_shape=jax.ShapeDtypeStruct((P, W), jnp.float32),
            grid=(n_tiles,),
            in_specs=[row_spec]
            + [const((W, W)) for _ in ws]
            + [const((1, W)) for _ in bs],
            out_specs=row_spec,
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 << 20),
        )(x, *ws, *bs)

    return call


def main():
    rng = np.random.default_rng(0)
    P = 196608  # fine-pass point count (1024 rays x 192)
    x = jnp.asarray(rng.standard_normal((P, W)).astype(np.float32) * 0.1).astype(jnp.bfloat16)
    ws = [jnp.asarray((rng.standard_normal((W, W)) * (1.0 / np.sqrt(W))).astype(np.float32)).astype(jnp.bfloat16) for _ in range(D)]
    bs = [jnp.asarray(rng.standard_normal((1, W)).astype(np.float32) * 0.01) for _ in range(D)]
    gflop = P * D * W * W * 2 / 1e9

    if "--ilp" in sys.argv:
        # Round-3 second block: the interleaved-chain ILP question, with
        # single-chain controls at the SAME tile row counts.
        configs = [
            ("variant A B=1024", 1024, "A", 1),
            ("variant A B=4096", 4096, "A", 1),
            ("ilp2 Beach=512", 1024, "A", 2),
            ("ilp2 Beach=1024", 2048, "A", 2),
            ("ilp2 Beach=2048", 4096, "A", 2),
            ("ilp4 Beach=512", 2048, "A", 4),
            ("ilp4 Beach=1024", 4096, "A", 4),
        ]
    else:
        configs = [
            (f"variant {v} B={B}", B, v, 1)
            for B in (512, 2048)
            for v in ("A", "B", "C", "D", "E")
        ]

    for name, B, v, k in configs:
        call = make_chain(P, B, v, interleave=k)

        def run(carry):
            def body(c, _):
                xc, wsc = c
                out = call(xc.astype(jnp.bfloat16), wsc, bs)
                # loop-carried dependence: fold the output back into x
                xc = xc + 0.0 * out.astype(xc.dtype)
                return (xc, wsc), 0.0

            c, _ = jax.lax.scan(body, carry, None, length=STEPS)
            return c

        fn = jax.jit(run)
        try:
            t0 = time.time()
            c = fn((x, ws))
            jax.device_get(jax.tree.leaves(c)[0].ravel()[0])
            compile_s = time.time() - t0
            t0 = time.time()
            c = fn(c)
            jax.device_get(jax.tree.leaves(c)[0].ravel()[0])
            wall = time.time() - t0
        except Exception as e:
            print(f"{name:24s}: FAILED {str(e)[:160]}", flush=True)
            results[name] = {"error": str(e)[:200]}
            continue
        ms = 1000.0 * wall / STEPS
        tflops = gflop / ms
        print(f"{name:24s}: {ms:6.2f} ms  {tflops:6.1f} TFLOP/s "
              f"({100 * tflops / 197:4.1f}% of bf16 roof, compile {compile_s:.0f}s)",
              flush=True)
        results[name] = {"ms": ms, "tflops": tflops}

    with open("/tmp/tpu_fwd_chain_probe.json", "w") as f:
        json.dump(results, f, indent=2)
    print(json.dumps(results), flush=True)


if __name__ == "__main__":
    main()
