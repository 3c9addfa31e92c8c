"""Dense stage-2 conv formulation shoot-out (B=8, grid 11x400x352, C=64).

Variants:
  a. conv3d z-major (B, D, H, W, C) NDHWC (new DenseTensor layout)
  b. conv3d old layout (B, H, W, D, C) spatial (h, w, d)
  c. z-window conv2d: (B*D_out, H, W, kz*C) 3x3 conv, Cin=192, Cout=64
  d. flat-z banded 2D conv: (B, H, W, D*C) 3x3, 704 -> 704 (3.7x FLOPs)

Run on TPU: python tools/microbench_dense.py
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/vision3d_xla_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from tools.tpu_timing import timeit_scanned

    rng = np.random.default_rng(0)
    B, D, H, W, C = 8, 11, 400, 352, 64
    flops = 2 * B * D * H * W * 27 * C * C

    def report(name, fn, fargs):
        t = timeit_scanned(fn, fargs, iters=10)
        print(f"{name:34s} {t*1e3:8.2f} ms  {flops/t/1e12:5.1f} TFLOP/s(eff)",
              flush=True)

    xz = jnp.asarray(rng.normal(size=(B, D, H, W, C)), jnp.bfloat16)
    wk = jnp.asarray(rng.normal(size=(3, 3, 3, C, C)) * 0.1, jnp.bfloat16)

    def conv3d_zmajor(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1, 1), ((1, 1), (1, 1), (1, 1)),
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            preferred_element_type=jnp.float32,
        )

    report("a.conv3d z-major", conv3d_zmajor, (xz, wk))

    xh = jnp.asarray(rng.normal(size=(B, H, W, D, C)), jnp.bfloat16)

    def conv3d_old(x, w):
        wk2 = jnp.transpose(w, (1, 2, 0, 3, 4))
        return jax.lax.conv_general_dilated(
            x, wk2, (1, 1, 1), ((1, 1), (1, 1), (1, 1)),
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            preferred_element_type=jnp.float32,
        )

    report("b.conv3d old (h,w,d)", conv3d_old, (xh, wk))

    def zwin_conv2d(x, w):
        # x (B, D, H, W, C); z-pad then window into (B, D, H, W, 3C)
        xp = jnp.pad(x, ((0, 0), (1, 1), (0, 0), (0, 0), (0, 0)))
        win = jnp.concatenate([xp[:, dz:dz + D] for dz in range(3)], axis=-1)
        w2 = jnp.transpose(w, (1, 2, 0, 3, 4)).reshape(3, 3, 3 * C, C)
        y = jax.lax.conv_general_dilated(
            win.reshape(B * D, H, W, 3 * C), w2, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
        )
        return y

    report("c.zwin conv2d Cin=192", zwin_conv2d, (xz, wk))

    xf = jnp.asarray(rng.normal(size=(B, H, W, D * C)), jnp.bfloat16)
    band = np.zeros((3, 3, D * C, D * C), np.float32)
    wnp = np.asarray(wk, np.float32)
    for zo in range(D):
        for dz in range(3):
            zi = zo + dz - 1
            if 0 <= zi < D:
                band[:, :, zi * C:(zi + 1) * C, zo * C:(zo + 1) * C] = wnp[
                    :, :, dz]
    wband = jnp.asarray(band, jnp.bfloat16)

    def flat_banded(x, w):
        return jax.lax.conv_general_dilated(
            x, w, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
        )

    report("d.flat banded 704->704", flat_banded, (xf, wband))

    # correctness cross-check a vs c on small slice
    ya = conv3d_zmajor(xz, wk)
    yc = zwin_conv2d(xz, wk).reshape(B, D, H, W, C)
    err = float(jnp.abs(ya - yc).max())
    print("a vs c max err:", err, flush=True)


if __name__ == "__main__":
    main()
