"""Latency-corrected TPU timing helpers.

The axon tunnel in this environment has ~27 ms host<->device round-trip
latency and an unreliable block_until_ready, so per-call wall timing is
meaningless. ``timeit_scanned`` chains ``iters`` executions of ``fn``
inside ONE jit program via lax.scan (threading a data dependency through
a dummy perturbation so XLA cannot CSE the iterations), reads back a
scalar once, and divides.
"""

import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def timeit_scanned(fn, args, iters=20, reduce_out=None):
    """fn(*args) -> pytree. Returns seconds per iteration (compute only)."""
    if reduce_out is None:
        def reduce_out(out):
            leaves = jax.tree_util.tree_leaves(out)
            return sum(jnp.sum(jnp.abs(l.astype(jnp.float32))) if l.dtype != bool
                       else jnp.sum(l) for l in leaves).astype(jnp.float32)

    first = jax.tree_util.tree_leaves(args)[0]

    def scanned(args):
        def body(carry, _):
            # Perturb EVERY leaf with a data-dependent no-op so no part of
            # fn is loop-invariant-hoisted out of the scan. Floats get
            # carry*1e-12; ints/bools get +isnan(carry) (always 0/False at
            # runtime, but XLA cannot prove it). Early versions perturbed
            # only the first float leaf — every purely-integer computation
            # (rulebook builds, sorts, lookups) was silently hoisted and
            # measured as ~free, which fabricated a phantom "composition
            # pathology" (see ARCHITECTURE.md round-2 notes).
            zero_i = jnp.isnan(carry).astype(jnp.int32)
            leaves, treedef = jax.tree_util.tree_flatten(args)
            bumped = []
            for l in leaves:
                if jnp.issubdtype(l.dtype, jnp.floating):
                    bumped.append(l + carry.astype(l.dtype) * 1e-12)
                elif l.dtype == jnp.bool_:
                    bumped.append(l ^ (zero_i > 0))
                elif jnp.issubdtype(l.dtype, jnp.integer):
                    bumped.append(l + zero_i.astype(l.dtype))
                else:
                    bumped.append(l)
            out = fn(*jax.tree_util.tree_unflatten(treedef, bumped))
            return reduce_out(out), None

        total, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=iters)
        return total

    f = jax.jit(scanned)
    np.asarray(f(args))  # compile + warm
    t0 = time.perf_counter()
    np.asarray(f(args))
    total = time.perf_counter() - t0
    # subtract one round-trip latency measured with a trivial program
    g = jax.jit(lambda x: x + 1)
    np.asarray(g(jnp.ones(())))
    t1 = time.perf_counter()
    np.asarray(g(jnp.ones(())))
    rt = time.perf_counter() - t1
    return max(total - rt, 1e-9) / iters


if __name__ == "__main__":
    # sanity: 4k matmul should show ~dozens of TFLOP/s
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (4096, 4096), jnp.bfloat16)
    w = jax.random.normal(key, (4096, 4096), jnp.bfloat16)
    dt = timeit_scanned(lambda x, w: x @ w, (x, w), iters=50)
    print(f"4k bf16 matmul: {dt*1e3:.3f} ms  {2*4096**3/dt/1e12:.1f} TFLOP/s")
