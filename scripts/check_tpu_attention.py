"""TPU numerics check for the fused VMEM attention kernel (VERDICT r3 #8).

Compares the compiled-Mosaic fused kernel against the dense XLA path ON
THE REAL TPU at the bench shapes (B=4, h=4, K=S=1024, dh=64):

1. raw kernel output vs the dense softmax reference (f32 logits, bf16
   PV — the kernel's exact numerics) within bf16 tolerance;
2. end-to-end through the full SuperGlue matcher (9 GNN layers, trained
   flagship weights when available, else random init): match-index
   equality >= 99% + matching-score agreement on the common matches.

Exit code 0 = pass. Run manually (ONE tpu client at a time on this box):

    python scripts/check_tpu_attention.py

The pytest wrapper (tests/test_learned_frontend.py::
test_fused_attention_tpu_numerics) subprocess-runs this when
FS_TPU_TESTS=1 — the suite itself is pinned to the virtual CPU mesh.
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    import jax
    import jax.numpy as jnp

    from forest_slam_tpu.utils import enable_compilation_cache

    enable_compilation_cache()

    dev = jax.devices()[0]
    print(f"# device: {dev.platform} {getattr(dev, 'device_kind', '')}")
    if dev.platform == "cpu":
        print("# not a TPU — this check is about the compiled Mosaic path")
        return 2

    from forest_slam_tpu.frontend.pallas_attention import (
        _dense_mirror,
        fused_attention,
    )

    rng = np.random.default_rng(0)
    B, h, K, S, dh = 4, 4, 1024, 1024, 64
    q = jnp.asarray(rng.normal(size=(B, h, K, dh)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(B, h, S, dh)), jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(B, h, S, dh)), jnp.bfloat16)
    mask = jnp.asarray(rng.random((B, S)) > 0.25)

    out = np.asarray(
        fused_attention(q, k, v, mask, scale=dh ** -0.5), np.float32
    )
    ref = np.asarray(
        jax.jit(_dense_mirror, static_argnames=("scale",))(
            q, k, v, mask, scale=dh ** -0.5
        ),
        np.float32,
    )
    err = np.max(np.abs(out - ref))
    print(f"# kernel vs dense mirror: max abs err {err:.4f}")
    if not err < 0.05:
        print("FAIL: kernel output diverges from dense reference")
        return 1

    # --- full matcher equivalence on bench-like inputs -------------------
    from forest_slam_tpu.frontend.superglue import SuperGlue, SuperGlueConfig

    cfg_x = SuperGlueConfig(
        attention_impl="xla", softmax_dtype="float32", sinkhorn_impl="xla"
    )
    cfg_f = cfg_x._replace(attention_impl="fused")
    sg_x, sg_f = SuperGlue(cfg_x), SuperGlue(cfg_f)

    # real inputs: trained SuperPoint extractions from two rendered
    # corridor frames (random descriptors are correctly rejected by the
    # trained matcher, which would make this comparison vacuous)
    weights_path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "weights", "learned_frontend_stem4_wb_blur2.msgpack",
    )
    params = None
    feats = None
    if os.path.exists(weights_path):
        try:
            from forest_slam_tpu.frontend.weights import (
                load_learned_frontend,
            )
            from forest_slam_tpu.io.synthetic import (
                corridor_trajectory,
                default_rig,
                make_corridor_world,
                render_view,
            )

            H, W = 600, 960
            fe, fp = load_learned_frontend(
                (H, W), path=weights_path, max_keypoints=1024
            )
            cfg_x = cfg_x._replace(
                gnn_layers=fe.cfg.superglue.gnn_layers,
                sinkhorn_iterations=fe.cfg.superglue.sinkhorn_iterations,
            )
            cfg_f = cfg_x._replace(attention_impl="fused")
            sg_x, sg_f = SuperGlue(cfg_x), SuperGlue(cfg_f)
            world = make_corridor_world(jax.random.PRNGKey(0))
            rig = default_rig(H, W, baseline=0.25)
            Ts = corridor_trajectory(2, speed=0.3)
            im = []
            for T in Ts:
                img, _ = render_view(
                    world, jnp.asarray(T), jnp.asarray(rig.left.K), H, W
                )
                im.append(img)
            feats = jax.jit(fe.extract)(fp, jnp.stack(im))
            params = fp["superglue"]
            print("# using trained flagship params on rendered frames")
        except Exception as e:
            print(f"# trained inputs unavailable ({e}); random init")

    if feats is not None:
        f0 = jax.tree.map(lambda a: a[0:1], feats)
        f1 = jax.tree.map(lambda a: a[1:2], feats)
        args = (
            f0.xy, f0.score, f0.desc, f0.valid,
            f1.xy, f1.score, f1.desc, f1.valid, (600, 960),
        )
    else:
        M = 1024
        xy0 = jnp.asarray(rng.uniform(0, 900, (B, M, 2)), jnp.float32)
        xy1 = xy0 + jnp.asarray(
            rng.normal(scale=2.0, size=(B, M, 2)), jnp.float32
        )
        sc = jnp.asarray(rng.random((B, M)), jnp.float32)
        d0 = jnp.asarray(rng.normal(size=(B, M, 256)), jnp.float32)
        d0 = d0 / jnp.linalg.norm(d0, axis=-1, keepdims=True)
        d1 = d0 + 0.1 * jnp.asarray(
            rng.normal(size=(B, M, 256)), jnp.float32
        )
        d1 = d1 / jnp.linalg.norm(d1, axis=-1, keepdims=True)
        valid = jnp.asarray(rng.random((B, M)) > 0.1)
        params = sg_x.init(
            jax.random.PRNGKey(0), xy0, sc, d0, valid, xy1, sc, d1, valid,
            (600, 960),
        )
        args = (xy0, sc, d0, valid, xy1, sc, d1, valid, (600, 960))
    rx = jax.jit(sg_x.apply)(params, *args)
    rf = jax.jit(sg_f.apply)(params, *args)

    min_matches = 50 if feats is not None else 0

    def compare(tag, ra, rb, min_agree=0.99, max_ds=0.05):
        ma, mb = np.asarray(ra.matches0), np.asarray(rb.matches0)
        sa = np.asarray(ra.matching_scores0)
        sb = np.asarray(rb.matching_scores0)
        agree = float(np.mean(ma == mb))
        both = (ma >= 0) & (ma == mb)
        ds = float(np.max(np.abs(sa[both] - sb[both]))) if both.any() else 0.0
        n_match = int((ma >= 0).sum())
        print(
            f"# {tag}: {n_match} matches, index agreement {agree:.4f}, "
            f"max score delta on common matches {ds:.4f}"
        )
        if n_match < min_matches:
            print(f"FAIL [{tag}]: too few matches — comparison is vacuous")
            return False
        if agree < min_agree:
            print(f"FAIL [{tag}]: match indices diverge")
            return False
        if ds > max_ds:
            print(f"FAIL [{tag}]: matching scores diverge on common matches")
            return False
        return True

    ok = compare("fused-attention matcher", rx, rf)

    # --- whole-layer fused GNN forward (pallas_gnn.py) -------------------
    from forest_slam_tpu.frontend.pallas_gnn import superglue_forward_fused

    rg = jax.jit(
        lambda p, *a: superglue_forward_fused(p, cfg_x, *a)
    )(params, *args)
    ok = compare("fused-GNN forward", rx, rg) and ok

    if not ok:
        return 1
    print("PASS")
    return 0


if __name__ == "__main__":
    sys.exit(main())
