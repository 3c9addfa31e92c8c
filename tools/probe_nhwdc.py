"""TPU probe: dense-stage layout NDHWC (current) vs NHWDC (D as the
innermost SPATIAL dim, C minor).

Why: dense_from_sparse_cols gathers (B, HW, D*C) rows and then pays a
(0,3,1,2,4) transpose into the z-major (B, D, H, W, C) conv layout
(~1.6GB each way at the stage-2 cutover, inside the measured 69.8ms).
A (B, H, W, D, C) view of the gather output is a FREE reshape, and XLA
convs accept arbitrary dimension orders — if conv3d runs as fast with
spatial dims (H, W, D), the transpose (and its inverse in to_bev)
disappears.

Shapes: stage-2 cutover geometry, batch 8, bf16.
"""

import argparse
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/vision3d_xla_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from tools.tpu_timing import timeit_scanned

    b = args.batch
    rng = np.random.default_rng(0)

    def conv_ndhwc(x, wk, stride, pad):
        return jax.lax.conv_general_dilated(
            x, wk, window_strides=stride,
            padding=tuple((p, p) for p in pad),
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        )

    def conv_nhwdc(x, wk, stride, pad):
        # spatial order (H, W, D); weight (ky, kx, kz, cin, cout)
        return jax.lax.conv_general_dilated(
            x, wk, window_strides=(stride[1], stride[2], stride[0]),
            padding=((pad[1], pad[1]), (pad[2], pad[2]), (pad[0], pad[0])),
            dimension_numbers=("NHWDC", "HWDIO", "NHWDC"),
        )

    cases = [
        # name, (D,H,W,Cin,Cout), kernel, stride, pad
        ("s2.subm", (11, 400, 352, 64, 64), (3, 3, 3), (1, 1, 1), (1, 1, 1)),
        ("s2.down", (11, 400, 352, 64, 64), (3, 3, 3), (2, 2, 2), (0, 1, 1)),
        ("s3.subm", (5, 200, 176, 64, 64), (3, 3, 3), (1, 1, 1), (1, 1, 1)),
    ]
    for name, (d, h, w, cin, cout), k, s, p in cases:
        x_zmaj = jnp.asarray(
            rng.normal(size=(b, d, h, w, cin)), jnp.bfloat16)
        x_hwd = jnp.asarray(
            rng.normal(size=(b, h, w, d, cin)), jnp.bfloat16)
        wk = jnp.asarray(
            rng.normal(size=(k[0], k[1], k[2], cin, cout)), jnp.bfloat16)
        wk_hwd = jnp.transpose(wk, (1, 2, 0, 3, 4))
        dt = timeit_scanned(lambda x: conv_ndhwc(x, wk, s, p), (x_zmaj,),
                            iters=args.iters)
        print(f"{name}.ndhwc  {dt*1e3:9.2f} ms", flush=True)
        dt = timeit_scanned(lambda x: conv_nhwdc(x, wk_hwd, s, p), (x_hwd,),
                            iters=args.iters)
        print(f"{name}.nhwdc  {dt*1e3:9.2f} ms", flush=True)
        # equality (small tolerance: same math, different layouts)
        a = jax.jit(lambda x: conv_ndhwc(x, wk, s, p))(x_zmaj)
        bb = jax.jit(lambda x: conv_nhwdc(x, wk_hwd, s, p))(x_hwd)
        bb_z = jnp.transpose(bb, (0, 3, 1, 2, 4))
        err = float(jnp.max(jnp.abs(a.astype(jnp.float32)
                                    - bb_z.astype(jnp.float32))))
        print(f"{name}.maxdiff {err:.4f}", flush=True)

    # the transpose both layouts would save/pay (stage-2 cutover)
    d, h, w, c = 11, 400, 352, 64
    df = jnp.asarray(rng.normal(size=(b, h * w, d * c)), jnp.bfloat16)
    dt = timeit_scanned(
        lambda x: jnp.transpose(x.reshape(b, h, w, d, c), (0, 3, 1, 2, 4))
        + 0.0,
        (df,), iters=args.iters)
    print(f"s2.densify_transpose {dt*1e3:9.2f} ms", flush=True)
    dt = timeit_scanned(
        lambda x: x.reshape(b, h, w, d, c) + 0.0, (df,), iters=args.iters)
    print(f"s2.densify_reshape   {dt*1e3:9.2f} ms", flush=True)


if __name__ == "__main__":
    main()
