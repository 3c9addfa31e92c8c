"""Round-5 tail probe: RPN + head maps + decode/NMS at bench settings
(bf16, car config, batch 8) — the ~47ms block bench.py carries beyond
the middle CNN, previously only known by subtraction.
"""

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/vision3d_xla_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from tools.tpu_timing import timeit_scanned
    from vision3d_tpu.config import Config
    from vision3d_tpu.core.anchors import make_anchors
    from vision3d_tpu.models.head import ProposalHead, head_inference
    from vision3d_tpu.models.rpn import RPN

    cfg = Config().replace(num_classes=1, compute_dtype="bfloat16")
    cfg = cfg.replace(anchors=cfg.anchors[:1])
    b = 8
    bev = jnp.zeros((b, 200, 176, 128), jnp.bfloat16)
    rpn = RPN(c_down=128, c_up=128)
    vs = rpn.init(jax.random.PRNGKey(0), bev, False)
    dt = timeit_scanned(lambda x: rpn.apply(vs, x, False), (bev,), iters=10)
    print(f"rpn(bf16)        {dt*1e3:9.2f} ms", flush=True)

    head = ProposalHead(cfg)
    feats = jax.random.normal(jax.random.PRNGKey(1), (b, 200, 176, 128),
                              jnp.bfloat16) * 0.03
    hv = head.init(jax.random.PRNGKey(0), feats)
    anchors = jnp.asarray(make_anchors(cfg))
    dt = timeit_scanned(lambda f: head.apply(hv, f), (feats,), iters=10)
    print(f"head_maps        {dt*1e3:9.2f} ms", flush=True)
    cls_map, reg_map = jax.jit(lambda f: head.apply(hv, f))(feats)
    dt = timeit_scanned(
        lambda c, r: head_inference(c, r, anchors, cfg), (cls_map, reg_map),
        iters=10)
    print(f"head_decode_nms  {dt*1e3:9.2f} ms", flush=True)


if __name__ == "__main__":
    main()
