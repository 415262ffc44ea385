"""2-D positional-encoding study: fit an MLP to a single image from encoded
(x, y) — demonstrates why Fourier features matter.

Capability parity with /root/reference/2d_pos_encoding/:
  * encoding (encoding.py:22-40): coords scaled to [-1,1] by per-axis max,
    layout [x, y, then per freq i: sin(2^i pi x), sin(2^i pi y),
    cos(2^i pi x), cos(2^i pi y)] — the reference's exact interleave;
  * model (model.py:6-43): layer_num x [Linear -> ReLU -> BatchNorm1d],
    Linear head; Xavier-uniform weights, zero biases;
  * training (utils.py:33-87, main.py:10-30): AdamW(1e-3), per-epoch
    ExponentialLR(0.95), batch 512, MSE + clip regularizer
    (mean(max(0, x-1) + max(0, -x)) * reg), gray-luma PSNR metric,
    metrics.csv append, periodic full-image reconstruction dumps;
  * CLI flags of main.py:33-49.

Checkpoints are .npz (this experiment's torch .pth files are internal to it;
no cross-compat requirement).
"""

from __future__ import annotations

import argparse
import os
import time
import numpy as np
import jax
import jax.numpy as jnp
import optax


def load_picture(path: str):
    """Image -> ([H*W, 2] (x, y) positions, [H*W, 3] colors, W, H)."""
    import imageio.v2 as imageio

    img = imageio.imread(path)
    if img.ndim == 2:
        img = np.repeat(img[..., None], 3, -1)
    img = img[..., :3].astype(np.float32) / 255.0
    H, W = img.shape[:2]
    xs, ys = np.meshgrid(np.arange(W), np.arange(H))
    pos = np.stack([xs.ravel(), ys.ravel()], -1).astype(np.float32)
    colors = img.reshape(-1, 3)
    return pos, colors, W, H


def encode(pos: jnp.ndarray, L: int) -> jnp.ndarray:
    """[N, 2] -> [N, 4L + 2] with the reference's channel interleave."""
    pos = 2.0 * (pos / jnp.max(pos, axis=0)) - 1.0
    outs = [pos]
    for i in range(L):
        f = (2.0**i) * jnp.pi
        outs.append(jnp.sin(f * pos[:, :1]))
        outs.append(jnp.sin(f * pos[:, 1:2]))
        outs.append(jnp.cos(f * pos[:, :1]))
        outs.append(jnp.cos(f * pos[:, 1:2]))
    return jnp.concatenate(outs, -1)


def init_model(rng, input_dim: int, layer_num: int, hidden: int = 256, out_dim: int = 3):
    """Xavier-uniform Linear stacks with BatchNorm state."""
    params, bn_state = [], []
    cur = input_dim
    for _ in range(layer_num):
        rng, k = jax.random.split(rng)
        bound = np.sqrt(6.0 / (cur + hidden))
        params.append(
            {
                "w": jax.random.uniform(k, (cur, hidden), jnp.float32, -bound, bound),
                "b": jnp.zeros((hidden,)),
                "gamma": jnp.ones((hidden,)),
                "beta": jnp.zeros((hidden,)),
            }
        )
        bn_state.append({"mean": jnp.zeros((hidden,)), "var": jnp.ones((hidden,))})
        cur = hidden
    rng, k = jax.random.split(rng)
    bound = np.sqrt(6.0 / (cur + out_dim))
    head = {
        "w": jax.random.uniform(k, (cur, out_dim), jnp.float32, -bound, bound),
        "b": jnp.zeros((out_dim,)),
    }
    return {"layers": params, "head": head}, bn_state


def apply_model(params, bn_state, x, train: bool, momentum: float = 0.1, eps: float = 1e-5):
    """Forward; returns (out, new_bn_state). Order matches the reference:
    Linear -> ReLU -> BatchNorm (model.py:15-19)."""
    new_state = []
    for lyr, st in zip(params["layers"], bn_state):
        x = jax.nn.relu(x @ lyr["w"] + lyr["b"])
        if train:
            mean = jnp.mean(x, 0)
            var = jnp.var(x, 0)
            new_state.append(
                {
                    "mean": (1 - momentum) * st["mean"] + momentum * mean,
                    "var": (1 - momentum) * st["var"] + momentum * var,
                }
            )
        else:
            mean, var = st["mean"], st["var"]
            new_state.append(st)
        x = (x - mean) / jnp.sqrt(var + eps) * lyr["gamma"] + lyr["beta"]
    return x @ params["head"]["w"] + params["head"]["b"], new_state


def clip_loss(x: jnp.ndarray, reg: float) -> jnp.ndarray:
    """Penalize outputs outside [0, 1] (reference utils.py:12-14)."""
    return jnp.mean(jnp.maximum(0.0, x - 1.0) + jnp.maximum(0.0, -x)) * reg


_GRAY = jnp.asarray([0.2989, 0.5870, 0.1140])


def gray_psnr(mse_gray: float) -> float:
    return float(10.0 * np.log(1.0 / mse_gray) / np.log(10.0))


def train(args):
    pos, colors, W, H = load_picture(args.picture_dir)
    enc = np.asarray(encode(jnp.asarray(pos), args.L))
    n = enc.shape[0]

    rng = jax.random.PRNGKey(0)
    params, bn_state = init_model(rng, 2 + 4 * args.L, args.layer_num)

    steps_per_epoch = max(n // 512, 1)
    schedule = lambda step: 1e-3 * (0.95 ** (step // steps_per_epoch))
    opt = optax.adamw(schedule)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, bn_state, opt_state, xb, yb):
        def loss_fn(p):
            out, new_bn = apply_model(p, bn_state, xb, train=True)
            mse = jnp.mean((out - yb) ** 2)
            gray_mse = jnp.mean(((out - yb) @ _GRAY) ** 2)
            return mse + clip_loss(out, args.regularization), (new_bn, mse, gray_mse)

        grads, (new_bn, mse, gray_mse) = jax.grad(loss_fn, has_aux=True)(params)
        updates, opt_state = opt.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), new_bn, opt_state, mse, gray_mse

    host = np.random.default_rng(0)
    metrics = {"MSE": [], "PSNR": []}
    t0 = time.time()
    for epoch in range(args.epochs):
        perm = host.permutation(n)
        tot_mse = tot_gray = 0.0
        for b in range(steps_per_epoch):
            idx = perm[b * 512 : (b + 1) * 512]
            params, bn_state, opt_state, mse, gray_mse = step(
                params, bn_state, opt_state, jnp.asarray(enc[idx]), jnp.asarray(colors[idx])
            )
            tot_mse += float(mse)
            tot_gray += float(gray_mse)
        avg_mse = tot_mse / steps_per_epoch
        psnr = gray_psnr(tot_gray / steps_per_epoch)
        metrics["MSE"].append(avg_mse)
        metrics["PSNR"].append(psnr)
        if args.v:
            print(
                f"Epoch {epoch + 1}/{args.epochs} MSE: {avg_mse:.4f} "
                f"PSNR: {psnr:.4f} time: {time.time() - t0:.2f}s"
            )
        if (epoch + 1) % 20 == 0:
            reconstruct(params, bn_state, enc, W, H, args, epoch + 1)

    stem = os.path.splitext(os.path.basename(args.picture_dir))[0]
    name = f"{stem}_{args.L}_{args.layer_num}_{args.regularization}"
    os.makedirs(args.checkpoint_save, exist_ok=True)
    np.savez(
        os.path.join(args.checkpoint_save, name + ".npz"),
        **{f"p_{i}": np.asarray(x) for i, x in enumerate(jax.tree.leaves(params))},
    )
    with open(os.path.join(os.path.dirname(args.output_dir) or ".", "metrics.csv"), "a") as f:
        f.write(f"{args.L},{args.epochs},{args.layer_num},{args.regularization},{metrics['PSNR'][-1]:.2f}\n")
    print(f"final mse: {metrics['MSE'][-1]}, final psnr: {metrics['PSNR'][-1]}")
    reconstruct(params, bn_state, enc, W, H, args, args.epochs)
    return metrics


def reconstruct(params, bn_state, enc, W, H, args, tag):
    from swnerf_tpu.utils.media import write_png

    out = np.asarray(apply_model(params, bn_state, jnp.asarray(enc), train=False)[0])
    img = np.clip(out.reshape(H, W, 3), 0, 1)
    stem = os.path.splitext(os.path.basename(args.picture_dir))[0]
    write_png(os.path.join(args.output_dir, f"{stem}_L{args.L}_e{tag}.png"), img)


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description="The configs")
    p.add_argument("--epochs", type=int, default=50)
    p.add_argument("--layer_num", type=int, default=10)
    p.add_argument("--picture_dir", "-pd", type=str, required=True)
    p.add_argument("--L", type=int, default=20, help="dimension of positional encoding")
    p.add_argument("--checkpoint_save", "-cs", type=str, default="2d_pos_encoding/checkpoint")
    p.add_argument("--checkpoint_load", "-cl", type=str, default=None)
    p.add_argument("-v", action="store_true", help="Verbose mode")
    p.add_argument("--output_dir", "-od", type=str, default="2d_pos_encoding/result")
    p.add_argument("--regularization", "-reg", type=float, default=0)
    return p


def main(argv=None):
    args = build_parser().parse_args(argv)
    os.makedirs(args.output_dir, exist_ok=True)
    train(args)


if __name__ == "__main__":
    main()
