"""Dense-stage conv3d backward memory probe (VERDICT r3 item 3 / r4 item 3).

Why training defaults to the fully-sparse graph (train_dense_from_stage=4,
config.py): XLA's conv3d BACKWARD at the stage-2 dense cutover shape
materializes tens of GB of f32 temporaries — more than one v5e's 16GB
HBM. This probe produces the committed evidence WITHOUT crashing a chip:
it lowers + compiles the candidate graphs and reports XLA's own
``memory_analysis`` (argument/output/temp bytes), then times the ones
that fit.

Probed variants, all at the full-geometry stage-2 dense shape
(B, 11, 400, 352, 64) with a 3-subm-conv + down-conv block (the real
stage-2 work):

  xla      — plain lax.conv_general_dilated chain, jax.grad through it
             (what train_dense_from_stage=2 would run).
  zchunk   — the same chain under a custom VJP that recomputes the
             forward PER Z-CHUNK in the backward (jax.checkpoint over
             z-slabs with halo): each chunk's conv backward works on a
             D/n_chunks-deep slab, dividing the temp working set.
  sparse   — the production conv-as-backward rulebook path's step for
             scale (reported from bench_train.py, not re-measured here).

Usage:
    python tools/probe_dense_backward.py [--batch 4] [--time]
"""

import argparse
import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np


def conv_block(x, weights, cdt):
    """3 subm convs + (3,3,3)/s2 down conv on z-major NDHWC volumes —
    the dense stage-2 compute of models/sparse_cnn.SpMiddleFHD."""
    import jax
    import jax.numpy as jnp

    for w in weights[:3]:
        x = jax.lax.conv_general_dilated(
            x.astype(cdt), w.astype(cdt), (1, 1, 1),
            ((1, 1), (1, 1), (1, 1)),
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        )
        x = jnp.maximum(x, 0.0)
    x = jax.lax.conv_general_dilated(
        x.astype(cdt), weights[3].astype(cdt), (2, 2, 2),
        ((0, 0), (1, 1), (1, 1)),
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )
    return jnp.maximum(x, 0.0)


def make_zchunk_block(n_chunks, cdt):
    """conv_block with the backward z-chunked via jax.checkpoint on
    halo'd z-slabs: forward = concat of per-slab convs (each slab padded
    by the receptive-field halo), backward recomputes one slab at a time
    so the conv backward temps scale with D/n_chunks instead of D."""
    import jax
    import jax.numpy as jnp

    HALO = 3  # 3 subm k3 convs: receptive field 3 in z per conv

    def block(x, weights):
        d = x.shape[1]
        bounds = np.linspace(0, d, n_chunks + 1).astype(int)

        def make_slab(lo):
            @jax.checkpoint
            def slab(xpad):
                # xpad is x[:, lo-halo : hi+halo] (zero-padded at volume
                # edges); run the 3 subm convs VALID in z. Each layer of
                # the plain chain re-zeroes its z padding, so after conv
                # k the slab rows whose GLOBAL z lies outside [0, d)
                # must be zeroed — a halo of raw zeros alone is not
                # equivalent (conv1 output at global z=-1 is nonzero and
                # would leak into conv2).
                y = xpad
                for k, w in enumerate(weights[:3]):
                    y = jax.lax.conv_general_dilated(
                        y.astype(cdt), w.astype(cdt), (1, 1, 1),
                        ((0, 0), (1, 1), (1, 1)),
                        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
                    )
                    y = jnp.maximum(y, 0.0)
                    # global z of this layer's rows: lo - (HALO - k - 1) + i
                    gz = (np.arange(y.shape[1]) + lo - (HALO - k - 1))
                    keep = jnp.asarray((gz >= 0) & (gz < d))
                    y = y * keep[None, :, None, None, None].astype(y.dtype)
                return y

            return slab

        # assemble the full subm output from slabs, then one down conv
        parts = []
        for i in range(n_chunks):
            lo, hi = int(bounds[i]), int(bounds[i + 1])
            lo_p, hi_p = max(lo - HALO, 0), min(hi + HALO, d)
            xpad = jnp.pad(
                x[:, lo_p:hi_p], ((0, 0), (HALO - (lo - lo_p),
                                           HALO - (hi_p - hi)),
                                  (0, 0), (0, 0), (0, 0)),
            )
            parts.append(make_slab(lo)(xpad))
        y = jnp.concatenate(parts, axis=1)
        y = jax.lax.conv_general_dilated(
            y.astype(cdt), weights[3].astype(cdt), (2, 2, 2),
            ((0, 0), (1, 1), (1, 1)),
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        )
        return jnp.maximum(y, 0.0)

    return block


def analyze(fn, args_):
    import jax

    lowered = jax.jit(fn).lower(*args_)
    compiled = lowered.compile()
    m = compiled.memory_analysis()
    return compiled, dict(
        temp_gb=round(m.temp_size_in_bytes / 2**30, 2),
        args_gb=round(m.argument_size_in_bytes / 2**30, 2),
        output_gb=round(m.output_size_in_bytes / 2**30, 2),
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--chunks", type=int, default=4)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--time", action="store_true",
                    help="also execute+time the variants that fit HBM")
    ap.add_argument("--out-json", default=None)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/vision3d_xla_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp

    cdt = jnp.bfloat16 if args.dtype == "bfloat16" else jnp.float32
    B, D, H, W, C = args.batch, 11, 400, 352, 64
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (B, D, H, W, C), jnp.float32)
    weights = [
        jax.random.normal(key, (3, 3, 3, C, C), jnp.float32) * 0.05
        for _ in range(4)
    ]

    def loss_xla(x, ws):
        return jnp.sum(conv_block(x, ws, cdt).astype(jnp.float32) ** 2)

    zblock = make_zchunk_block(args.chunks, cdt)

    def loss_zchunk(x, ws):
        return jnp.sum(zblock(x, ws).astype(jnp.float32) ** 2)

    result = {"shape": [B, D, H, W, C], "dtype": args.dtype,
              "hbm_gb": 15.75, "chunks": args.chunks}
    for name, loss in [("xla_backward", loss_xla),
                       ("zchunk_backward", loss_zchunk)]:
        grad = jax.grad(loss, argnums=(0, 1))
        try:
            compiled, mem = analyze(grad, (x, weights))
            result[name] = mem
            fits = mem["temp_gb"] + mem["args_gb"] + mem["output_gb"] < 14.5
            result[name]["fits_hbm"] = bool(fits)
            if args.time and fits:
                import time

                out = compiled(x, weights)
                jax.block_until_ready(out)
                t0 = time.perf_counter()
                out = compiled(x, weights)
                jax.block_until_ready(out)
                result[name]["ms"] = round(
                    (time.perf_counter() - t0) * 1e3, 1)
        except Exception as e:  # compile-time OOM is itself the datum
            result[name] = {"error": str(e)[:300]}
        print(name, result[name], flush=True)

    print(json.dumps(result))
    if args.out_json:
        with open(args.out_json, "w") as f:
            json.dump(result, f, indent=2)


if __name__ == "__main__":
    main()
