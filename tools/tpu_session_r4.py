"""One-claim TPU measurement session for round 4.

TPU claims are minutes of hand-over latency each and can take repeated
~30-min UNAVAILABLE cycles to recover after an abrupt kill — so when a
claim lands, extract everything in one long-lived process:

  1. on-device parity suite (tools/check_tpu_parity.py) — records the
     stem=True fused-block result on the FIXED double-snap path (the
     pre-fix kernel was the one measured in round 3; ADVICE r3).
  2. GSM gate measurements: factored channel-GEMM (kernels/gated_shift.
     gsf_gate) vs the direct grouped conv3d (gsf_gate_conv) at the real
     s3/s4 GatedShift geometries, plus a full rny002_gsm flagship train
     step vs rny002_gsf (VERDICT r3 item 7: a measured *_gsm step delta).
  3. SNB challenge-geometry bench (tools/bench_snb.py): 796x448 b4 c100
     train across the hflip-schedule / photometric-gating variants +
     inference (VERDICT r3 item 3).
  4. flagship bench.py with driver-default knobs (publishable numbers).

All results land in /tmp/r4_session.json (and each sub-tool's own file).
Exit code 1 if the parity suite fails; everything else still runs.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def gsm_measurements() -> dict:
    """Gate formulation microbench at the real GatedShift geometries, then
    the full rny002_gsm flagship step (vs rny002_gsf on the same inputs).

    Timing per CLAUDE.md rules: inputs chain through the iterations (the
    runtime dedups bit-identical dispatches; only dependency chains time
    honestly).
    """
    import jax
    import jax.numpy as jnp
    import numpy as np

    from tdeed_tpu.kernels.gated_shift import gsf_gate, gsf_gate_conv
    from tdeed_tpu.models.regnet import ARCH_PARAMS, generate_stages
    from tdeed_tpu.models.shift import fold_dim_for

    pp = ARCH_PARAMS["rny002"]
    widths, depths, _ = generate_stages(
        pp["w0"], pp["wa"], pp["wm"], pp["depth"], pp["group_size"]
    )
    out: dict = {}

    # GatedShift geometries at the flagship envelope (224 crop, b8 c100):
    # s3 runs at stride 16 (14x14), s4 at stride 32 (7x7); the shifted head
    # is fold_dim channels of the stage width (models/shift.py:fold_dim_for).
    geoms = {
        "s3": (14, fold_dim_for(widths[2])),
        "s4": (7, fold_dim_for(widths[3])),
    }
    B, T = 8, 100
    r = np.random.default_rng(0)
    for name, (hw, fold) in geoms.items():
        xn = jnp.asarray(r.normal(size=(B, T, hw, hw, fold)), jnp.bfloat16)
        gw = jnp.asarray(r.normal(size=(3, 3, 3, fold // 2, 2)) * 0.02,
                         jnp.float32)
        gb = jnp.zeros((2,), jnp.float32)

        for label, fn in (("gemm", gsf_gate), ("conv", gsf_gate_conv)):
            @jax.jit
            def chained(x, salt, fn=fn):
                g = fn((x + salt).astype(jnp.bfloat16), gw, gb)
                return g, g.astype(jnp.float32).sum() * 1e-6

            salt = jnp.bfloat16(0)
            g, salt = chained(xn, salt)
            g, salt = chained(xn, salt)
            jax.block_until_ready(g)
            iters = 30
            t0 = time.perf_counter()
            for _ in range(iters):
                g, salt = chained(xn, salt)
            jax.block_until_ready(g)
            ms = (time.perf_counter() - t0) / iters * 1e3
            out[f"gate_{name}_{label}_ms"] = round(ms, 3)
            print(f"[gsm gate] {name} {label}: {ms:.3f} ms "
                  f"(B{B} T{T} {hw}x{hw} fold={fold})", flush=True)

    # Full flagship train step: rny002_gsm vs rny002_gsf, same batches.
    from tdeed_tpu.config import TDEEDConfig
    from tdeed_tpu.models.tdeed import build_model
    from tdeed_tpu.train.schedule import make_optimizer
    from tdeed_tpu.train.state import TrainState
    from tdeed_tpu.train.step import make_train_step

    tx = make_optimizer(8e-4, warmup_steps=100, cosine_steps=10_000)
    batches = None
    for arch in ("rny002_gsm", "rny002_gsf"):
        cfg = TDEEDConfig(
            dataset="finediving", num_classes=4, clip_len=100, crop_dim=224,
            feature_arch=arch, n_layers=2, sgp_ks=7, sgp_r=4,
            radi_displacement=2,
        )
        model = build_model(cfg)
        variables = jax.jit(model.init, static_argnums=(2,))(
            jax.random.PRNGKey(0),
            jnp.zeros((1, 100, 224, 224, 3), jnp.float32), False,
        )
        state = TrainState.create(
            variables["params"], variables["batch_stats"], tx
        )
        step = jax.jit(
            make_train_step(
                model, tx, crop_dim=224, num_classes_bg=cfg.num_classes_bg,
                mixup=True, radi_displacement=2,
            ),
            donate_argnums=(0,),
        )
        if batches is None:
            def mk():
                return {
                    "frame": r.integers(0, 256, (8, 100, 256, 256, 3),
                                        np.uint8),
                    "label": r.integers(0, 5, (8, 100)).astype(np.int32),
                    "labelD": r.integers(-2, 3, (8, 100)).astype(np.float32),
                    "frame2": r.integers(0, 256, (8, 100, 256, 256, 3),
                                         np.uint8),
                    "label2": r.integers(0, 5, (8, 100)).astype(np.int32),
                    "labelD2": r.integers(-2, 3, (8, 100)).astype(np.float32),
                }
            batches = [jax.tree.map(jnp.asarray, mk()) for _ in range(2)]
        rng = jax.random.PRNGKey(1)
        state, metrics = step(state, batches[0], rng)
        for i in range(3):
            state, metrics = step(state, batches[i % 2], rng)
        jax.block_until_ready(metrics["loss"])
        t0 = time.perf_counter()
        iters = 10
        for i in range(iters):
            state, metrics = step(state, batches[i % 2], rng)
        jax.block_until_ready(metrics["loss"])
        dt = time.perf_counter() - t0
        out[f"step_{arch}_ms"] = round(dt / iters * 1e3, 2)
        out[f"step_{arch}_fps"] = round(8 * 100 * iters / dt, 1)
        print(f"[gsm step] {arch}: {out[f'step_{arch}_ms']} ms/step "
              f"({out[f'step_{arch}_fps']} f/s)", flush=True)
        del state
    return out


def main() -> None:
    session: dict = {}

    print("=== parity suite (fixed stem path) ===", flush=True)
    parity_rc = 0
    try:
        import tools.check_tpu_parity as parity

        parity.main()
    except SystemExit as e:
        parity_rc = int(e.code or 0)
    except Exception as e:
        import traceback

        traceback.print_exc()
        print(f"parity suite CRASHED: {type(e).__name__}", flush=True)
        parity_rc = 1
    session["parity_rc"] = parity_rc

    print("=== GSM gate + step measurements ===", flush=True)
    try:
        session["gsm"] = gsm_measurements()
    except Exception as e:
        import traceback

        traceback.print_exc()
        session["gsm"] = {"error": type(e).__name__}

    print("=== SNB challenge-geometry bench ===", flush=True)
    try:
        import tools.bench_snb as snb

        session["snb"] = snb.main(["--out", "/tmp/snb_results.json"])
    except Exception as e:
        import traceback

        traceback.print_exc()
        session["snb"] = {"error": type(e).__name__}

    print("=== flagship bench (driver-default knobs) ===", flush=True)
    try:
        for k in ("FUSE_ENTRY", "FUSE_SHIFT", "FUSE_PALLAS", "PHOTO_GATED",
                  "FLIP_MODE"):
            os.environ.pop(k, None)
        import bench

        session["flagship"] = bench.main()
    except Exception as e:
        import traceback

        traceback.print_exc()
        session["flagship"] = {"error": type(e).__name__}

    with open("/tmp/r4_session.json", "w") as fp:
        json.dump(session, fp, indent=2)
    print(json.dumps(session))
    sys.exit(parity_rc)


if __name__ == "__main__":
    main()
