"""One-step GRADIENT parity: the PyTorch reference vs swnerf_tpu on the
same weights and the same deterministic ray batch (perturb=0, noise=0,
det sample_pdf) — isolates the training-step math (forward + loss +
backward) from sampling/schedule stochasticity.

Forward parity is already pinned (tests/test_checkpoint.py); if the grads
match too, any end-to-end PSNR delta comes from RNG-stream/schedule
differences, not the step itself."""

from __future__ import annotations

import sys

sys.path.insert(0, "/root/repo")

import numpy as np

sys.path.insert(0, "/root/repo/benchmarks")
from parity_vs_torch import import_reference_module, install_reference_stubs

N_RAYS = 64
N_SAMP = 32
D, W, MR, MRV = 8, 256, 10, 4


def main():
    install_reference_stubs()
    import torch

    import jax
    import jax.numpy as jnp

    from swnerf_tpu.models import VanillaNeRFConfig, make_vanilla_field
    from swnerf_tpu.models.common import set_matmul_precision
    from swnerf_tpu.render import Rays, RenderConfig, render_rays
    from swnerf_tpu.train.checkpoint import params_to_state_dict

    set_matmul_precision(jax.lax.Precision.HIGHEST)

    cfg = VanillaNeRFConfig(netdepth=D, netwidth=W, multires=MR,
                            multires_views=MRV, output_ch=5)
    field = make_vanilla_field(cfg, fused=False)
    params = {"coarse": field.init(jax.random.PRNGKey(0)),
              "fine": field.init(jax.random.PRNGKey(1))}

    rng = np.random.default_rng(0)
    d = rng.standard_normal((N_RAYS, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    o = np.zeros((N_RAYS, 3), np.float32)
    o[:, 2] = 4.0
    target = rng.uniform(0, 1, (N_RAYS, 3)).astype(np.float32)

    rcfg = RenderConfig(n_samples=N_SAMP, n_importance=N_SAMP, perturb=0.0,
                        raw_noise_std=0.0, white_bkgd=True, use_viewdirs=True)

    # ---- ours: jax grads -------------------------------------------------
    rays = Rays(jnp.asarray(o), jnp.asarray(d), jnp.asarray(d),
                jnp.full((N_RAYS,), 2.0), jnp.full((N_RAYS,), 6.0), None)

    def loss_fn(p):
        out = render_rays(field, p["coarse"], rays, rcfg, rng=None,
                          fine_params=p["fine"])
        return (jnp.mean((out["rgb"] - target) ** 2)
                + jnp.mean((out["rgb0"] - target) ** 2))

    loss_ours, grads = jax.value_and_grad(loss_fn)(params)
    print(f"ours loss {float(loss_ours):.8f}")

    # ---- reference: torch grads -----------------------------------------
    mod = import_reference_module("nerf/run.py")
    torch.set_default_tensor_type(torch.FloatTensor)

    class A:  # the subset of args create_nerf reads (run.py:222-311)
        netdepth = D; netwidth = W; netdepth_fine = D; netwidth_fine = W
        N_importance = N_SAMP; N_samples = N_SAMP
        use_viewdirs = True; i_embed = 0; multires = MR; multires_views = MRV
        perturb = 0.0; raw_noise_std = 0.0; white_bkgd = True
        netchunk = 1 << 16; lrate = 5e-4; no_reload = True; ft_path = None
        basedir = "/tmp/gp"; expname = "gp"; dataset_type = "blender"
        lindisp = False

    import os
    os.makedirs("/tmp/gp/gp", exist_ok=True)
    render_kwargs_train, _, _, grad_vars, _ = mod.create_nerf(A())
    render_kwargs_train.update(near=2.0, far=6.0, ndc=False)

    # copy OUR params into the torch modules via the .tar state-dict codec
    sd_c = params_to_state_dict("vanilla", params["coarse"])
    sd_f = params_to_state_dict("vanilla", params["fine"])
    render_kwargs_train["network_fn"].load_state_dict(
        {k: torch.tensor(np.asarray(v)) for k, v in sd_c.items()})
    render_kwargs_train["network_fine"].load_state_dict(
        {k: torch.tensor(np.asarray(v)) for k, v in sd_f.items()})

    batch_rays = torch.stack([torch.tensor(o), torch.tensor(d)], 0)
    rgb, disp, acc, extras = mod.render(
        100, 100, None, chunk=1 << 15, rays=batch_rays,
        retraw=True, **render_kwargs_train)
    tt = torch.tensor(target)
    loss_ref = mod.img2mse(rgb, tt) + mod.img2mse(extras["rgb0"], tt)
    loss_ref.backward()
    print(f"ref  loss {float(loss_ref):.8f}  delta {float(loss_ref) - float(loss_ours):+.2e}")

    # ---- compare grads ---------------------------------------------------
    worst = ("", 0.0)
    for which, net in (("coarse", "network_fn"), ("fine", "network_fine")):
        sd_grad = {k: v.grad for k, v in
                   render_kwargs_train[net].named_parameters()}
        ours_sd = params_to_state_dict(
            "vanilla", jax.tree.map(lambda x: x, grads[which]))
        for k, g_ref in sd_grad.items():
            g_ours = np.asarray(ours_sd[k])
            g_ref = g_ref.detach().numpy()
            denom = max(np.abs(g_ref).max(), 1e-8)
            rel = np.abs(g_ours - g_ref).max() / denom
            if rel > worst[1]:
                worst = (f"{which}.{k}", rel)
            status = "OK " if rel < 1e-3 else "BAD"
            print(f"  {status} {which}.{k:28s} max|ref|={np.abs(g_ref).max():.3e} "
                  f"rel_err={rel:.2e}")
    print(f"worst: {worst[0]} rel_err={worst[1]:.3e}")


if __name__ == "__main__":
    main()
