"""Convergence-scale training equivalence: jax train step vs the torch oracle.

The 4-step golden test (tests/test_train_step_oracle.py) pins the exact
per-step recipe; this experiment extends the proof to CONVERGENCE scale —
the regime where BN running stats, the chained LR schedule past warmup
(ref: train_tdeed.py:79-87), weight decay and hundreds of AdamW updates
express. Both implementations train from IDENTICAL weights on the same
fixed batch sequence from the synthetic finediving fixture to near-overfit,
then evaluate through the same protocol stack (sliding windows ->
support-normalized aggregation -> displacement decode -> NMS ->
tolerance-mAP; ref: util/eval.py:264-419) with each side's own forward +
decode.

fp32 conditioning context (measured, docs/DESIGN.md "train-step parity"):
torch's OWN f32-vs-f64 loss trajectory diverges 19% by step 2 — pointwise
step-N equality is not a meaningful target past the first steps. The
equivalence claims here are the ones that survive that chaos:
  * step-0 losses agree tightly (forward + loss composition),
  * both losses collapse to near-overfit with terminal plateaus in the
    same band,
  * best-epoch selection (val-loss criterion) agrees,
  * final train-split tolerance-mAP (memorization through the full eval
    protocol) agrees.

Stochastic stages are neutralized identically (photometric off, dropout
off) — each has its own parity test elsewhere. Mixup is off by default;
``--mixup`` trains BOTH sides with the reference mixup recipe under
IDENTICAL per-step lambdas (the jax side draws them from its step-folded
PRNG; the torch side replays the exact same values — injected randomness
at convergence scale).

Run (CPU, ~15-40 min on one contended core):
    PYTHONPATH=/root/repo JAX_PLATFORMS=cpu python tools/convergence_check.py \
        [--steps 400] [--out /tmp/convergence.json]
Chaos controls (either side alone, init perturbed at rounding level):
    ... --perturb 1e-6 --skip-torch        # jax-side control
    ... --perturb-torch 1e-6 --skip-jax    # torch-side control
Record the results in docs/DESIGN.md.
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys
import tempfile
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

B, CLIP_LEN, SIZE = 2, 8, 32
NUM_CLASSES = 4
NC_BG = NUM_CLASSES + 1
N_LAYERS, KS, K = 1, 3, 2.0
LR, WD = 1e-3, 0.01
STEPS_PER_EPOCH = 25


def build_batches(fixture, n_batches, mixup=False):
    """Decode a fixed batch sequence once; both frameworks replay it."""
    from tdeed_tpu.data.clips import plan_clips
    from tdeed_tpu.data.loader import BatchLoader, ClipSampler

    plan = plan_clips(
        "finediving",
        os.path.join(fixture["data_root"], "finediving", "train.json"),
        fixture["frame_dir"],
        {f"class{i}": i for i in range(1, NUM_CLASSES + 1)},
        CLIP_LEN, 1, 0.5, 1,
    )
    sampler = ClipSampler(plan, CLIP_LEN, 1, 1, mixup=mixup)
    loader = BatchLoader(sampler, B, dataset_len=B * n_batches, num_workers=2,
                         seed=11)
    return list(loader.epoch(0))


def mixup_lam_sequence(steps):
    """Replicate the train step's per-step lambda draws host-side.

    make_train_step folds the caller key with state.step
    (train/step.py:164) and takes the first of a 4-way split as the mixup
    key (train/step.py:86); jax PRNG is deterministic, so the torch side
    can replay the EXACT lambdas the jitted jax step draws — injected
    randomness without any monkeypatching (same idea as the
    injected-lambda oracle test, extended to convergence scale)."""
    import jax

    from tdeed_tpu.train import augment

    base = jax.random.PRNGKey(42)  # jax_run's step key
    out = []
    for s in range(steps):
        k_mix = jax.random.split(jax.random.fold_in(base, s), 4)[0]
        out.append(np.asarray(augment.sample_mixup_lam(k_mix, B)))
    return out


def torch_run(batches, val_batches, steps, oracle, warmup, cosine,
              lam_seq=None):
    import torch
    import torch.nn.functional as F

    mean = torch.tensor([0.485, 0.456, 0.406]).view(1, 1, 3, 1, 1)
    std = torch.tensor([0.229, 0.224, 0.225]).view(1, 1, 3, 1, 1)
    ce_w = torch.tensor([1.0] + [5.0] * NUM_CLASSES)

    def prep(frames_u8):
        x = torch.from_numpy(frames_u8).float().permute(0, 1, 4, 2, 3) / 255.0
        return (x - mean) / std

    def loss_of(batch):
        logits, pred_d = oracle(prep(batch["frame"]))
        return F.cross_entropy(
            logits.reshape(-1, NC_BG),
            torch.from_numpy(batch["label"]).long().reshape(-1),
            weight=ce_w,
        ) + F.mse_loss(pred_d, torch.from_numpy(batch["labelD"]))

    def mixup_loss_of(batch, lam):
        # Reference mixup recipe (ref: model/model.py:228-254) with the
        # replayed lambdas: raw-pixel blend, the documented one-off bf16
        # rounding of the blended pixels (train/augment.py:mixup_batch),
        # soft weighted CE, mixed displacement targets.
        lam_t = torch.from_numpy(lam)
        blend = (
            lam_t.view(B, 1, 1, 1, 1)
            * torch.from_numpy(batch["frame"]).float()
            + (1.0 - lam_t.view(B, 1, 1, 1, 1))
            * torch.from_numpy(batch["frame2"]).float()
        )
        blend = blend.to(torch.bfloat16).float()
        x = blend.permute(0, 1, 4, 2, 3) / 255.0
        logits, pred_d = oracle((x - mean) / std)
        oh = F.one_hot
        soft = lam_t.view(B, 1, 1) * oh(
            torch.from_numpy(batch["label"]).long(), NC_BG
        ) + (1.0 - lam_t.view(B, 1, 1)) * oh(
            torch.from_numpy(batch["label2"]).long(), NC_BG
        )
        loss = F.cross_entropy(
            logits.reshape(-1, NC_BG), soft.reshape(-1, NC_BG).float(),
            weight=ce_w,
        )
        mix_d = lam_t.view(B, 1) * torch.from_numpy(batch["labelD"]) + (
            1.0 - lam_t.view(B, 1)
        ) * torch.from_numpy(batch["labelD2"])
        return loss + F.mse_loss(pred_d, mix_d)

    opt = torch.optim.AdamW(oracle.parameters(), lr=LR, betas=(0.9, 0.999),
                            eps=1e-8, weight_decay=WD)
    sched = torch.optim.lr_scheduler.ChainedScheduler([
        torch.optim.lr_scheduler.LinearLR(
            opt, start_factor=0.01, end_factor=1.0, total_iters=warmup),
        torch.optim.lr_scheduler.CosineAnnealingLR(opt, cosine),
    ])

    losses, val_losses = [], []
    for s in range(steps):
        oracle.train()
        b = batches[s % len(batches)]
        loss = (mixup_loss_of(b, lam_seq[s]) if lam_seq is not None
                else loss_of(b))
        opt.zero_grad()
        loss.backward()
        opt.step()
        sched.step()
        losses.append(float(loss.detach()))
        if (s + 1) % STEPS_PER_EPOCH == 0:
            oracle.eval()
            with torch.no_grad():
                val_losses.append(
                    float(np.mean([float(loss_of(vb)) for vb in val_batches]))
                )
    return losses, val_losses


def jax_run(batches, val_batches, steps, model, params, batch_stats,
            warmup, cosine, mixup=False):
    import jax
    import jax.numpy as jnp

    from tdeed_tpu.train.schedule import make_optimizer
    from tdeed_tpu.train.state import TrainState
    from tdeed_tpu.train.step import make_train_step, make_val_step

    tx = make_optimizer(LR, warmup_steps=warmup, cosine_steps=cosine)
    state = TrainState.create(params, batch_stats, tx)
    step_fn = jax.jit(make_train_step(
        model, tx, crop_dim=None, num_classes_bg=NC_BG, mixup=mixup,
        radi_displacement=1, pallas_augment=False,
    ))
    val_fn = jax.jit(make_val_step(
        model, crop_dim=None, num_classes_bg=NC_BG, radi_displacement=1,
    ))

    key = jax.random.PRNGKey(42)
    train_keys = ("frame", "label", "labelD") + (
        ("frame2", "label2", "labelD2") if mixup else ()
    )
    losses, val_losses = [], []
    for s in range(steps):
        b = batches[s % len(batches)]
        batch = {k: jnp.asarray(b[k]) for k in train_keys}
        state, metrics = step_fn(state, batch, key)
        losses.append(float(metrics["loss"]))
        if (s + 1) % STEPS_PER_EPOCH == 0:
            vl = [
                float(val_fn(state, {k: jnp.asarray(vb[k])
                                     for k in ("frame", "label", "labelD")})["loss"])
                for vb in val_batches
            ]
            val_losses.append(float(np.mean(vl)))
    return losses, val_losses, state


def neutralize_stochastic_stages():
    """Photometric aug -> /255+standardize; dropout -> identity (same
    neutralization as tests/test_train_step_oracle.py)."""
    import jax.numpy as jnp
    from flax import linen as fnn

    from tdeed_tpu.train import augment

    augment.train_preprocess = lambda frames, key, crop: augment.standardize(
        frames.astype(jnp.float32) / 255.0
    )
    fnn.Dropout = lambda rate, deterministic=None: (lambda x: x)


def torch_predict_fn(oracle):
    """Reference-style inference: eval forward + softmax + displacement
    decode (ref: model/model.py:334-369, modules.py:406-414), as a
    predict_fn for the shared protocol evaluator."""
    import torch

    mean = torch.tensor([0.485, 0.456, 0.406]).view(1, 1, 3, 1, 1)
    std = torch.tensor([0.229, 0.224, 0.225]).view(1, 1, 3, 1, 1)

    def fn(frames_u8, hflip=False):
        assert not hflip
        x = torch.from_numpy(np.asarray(frames_u8)).float()
        x = x.permute(0, 1, 4, 2, 3) / 255.0
        x = (x - mean) / std
        oracle.eval()
        with torch.no_grad():
            logits, displ = oracle(x)
            probs = torch.softmax(logits, dim=-1).numpy()
            displ = displ.numpy()
        # process_prediction: scatter each frame's scores to t-round(displ),
        # max-aggregate (ref: model/modules.py:406-414).
        out = np.zeros_like(probs)
        bsz, t, _ = probs.shape
        for i in range(bsz):
            for j in range(t):
                tgt = min(max(j - int(np.round(displ[i, j])), 0), t - 1)
                out[i, tgt] = np.maximum(out[i, tgt], probs[i, j])
        return out

    return fn


def main(argv=None) -> dict:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--steps", type=int, default=400)
    p.add_argument("--out", default=None)
    p.add_argument("--mixup", action="store_true",
                   help="train BOTH sides with reference mixup "
                        "(Beta(0.2,0.2) frame blend + soft weighted CE + "
                        "mixed displacement targets) using IDENTICAL "
                        "per-step lambdas: the jax side draws them from its "
                        "step-folded PRNG, the torch side replays the exact "
                        "same values (mixup_lam_sequence)")
    p.add_argument("--perturb", type=float, default=0.0,
                   help="relative N(0,1) noise applied to the jax init; "
                        "measures how much rounding-level chaos ALONE moves "
                        "the terminal metrics (the scale against which any "
                        "torch-vs-jax terminal difference must be judged)")
    p.add_argument("--perturb-torch", type=float, default=0.0,
                   help="relative N(0,1) noise applied to the TORCH init "
                        "(applied after the jax params are derived, so only "
                        "the torch side moves) — the symmetric chaos control")
    p.add_argument("--skip-torch", action="store_true",
                   help="jax side only (for --perturb chaos probes)")
    p.add_argument("--skip-jax", action="store_true",
                   help="torch side only (for --perturb-torch chaos probes)")
    args = p.parse_args(argv)

    import torch

    torch.manual_seed(3)

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_default_matmul_precision", "highest")
    from tdeed_tpu.utils.profiling import enable_compilation_cache

    enable_compilation_cache()
    neutralize_stochastic_stages()

    from tdeed_tpu.models.regnet import ARCH_PARAMS, generate_stages
    from tdeed_tpu.models.tdeed import TDEED
    from tests.fixtures import make_finediving_fixture
    from tests.test_train_step_oracle import flax_params_from_tdeed_oracle
    from tests.torch_oracles import OracleTDEED

    pp = ARCH_PARAMS["rny002"]
    widths, depths, groups = generate_stages(
        pp["w0"], pp["wa"], pp["wm"], pp["depth"], pp["group_size"]
    )
    oracle = OracleTDEED(
        widths, depths, groups, clip_len=CLIP_LEN, num_classes_bg=NC_BG,
        n_layers=N_LAYERS, ks=KS, k=K,
    )
    with torch.no_grad():
        oracle.temp_enc.normal_(std=1.0 / CLIP_LEN)

    model = TDEED(
        num_classes=NUM_CLASSES, clip_len=CLIP_LEN, feature_arch="rny002_gsf",
        n_layers=N_LAYERS, sgp_ks=KS, sgp_r=K, radi_displacement=1,
        dtype=jnp.float32,
    )
    variables = jax.jit(model.init, static_argnums=2)(
        jax.random.PRNGKey(0),
        jnp.zeros((B, CLIP_LEN, SIZE, SIZE, 3), jnp.float32), False,
    )
    params0 = jax.tree.map(
        lambda x: jnp.asarray(x, jnp.float32),
        flax_params_from_tdeed_oracle(oracle, depths),
    )
    if args.perturb:
        leaves, treedef = jax.tree.flatten(params0)
        keys = jax.random.split(jax.random.PRNGKey(7), len(leaves))
        leaves = [
            x * (1.0 + args.perturb * jax.random.normal(k, x.shape, x.dtype))
            for x, k in zip(leaves, keys)
        ]
        params0 = jax.tree.unflatten(treedef, leaves)
    if args.perturb_torch:
        # After params0 derivation: only the torch trajectory is perturbed.
        gen = torch.Generator().manual_seed(7)
        with torch.no_grad():
            for prm in oracle.parameters():
                noise = torch.randn(prm.shape, generator=gen,
                                    dtype=prm.dtype)
                prm.mul_(1.0 + args.perturb_torch * noise)

    warmup = min(2 * STEPS_PER_EPOCH, args.steps // 4)
    cosine = max(args.steps - warmup, 1)

    with tempfile.TemporaryDirectory() as root:
        fixture = make_finediving_fixture(
            root, num_videos=2, num_frames=48, size=SIZE
        )
        batches = build_batches(fixture, 8, mixup=args.mixup)
        val_batches = batches[:2]
        lam_seq = mixup_lam_sequence(args.steps) if args.mixup else None

        t0 = time.time()
        if args.skip_torch:
            tl, tvl = None, None
        else:
            tl, tvl = torch_run(batches, val_batches, args.steps, oracle,
                                warmup, cosine, lam_seq=lam_seq)
        t_torch = time.time() - t0
        t0 = time.time()
        if args.skip_jax:
            jl, jvl, state = None, None, None
        else:
            jl, jvl, state = jax_run(batches, val_batches, args.steps, model,
                                     params0, variables["batch_stats"],
                                     warmup, cosine, mixup=args.mixup)
        t_jax = time.time() - t0

        # --- final eval through the shared protocol stack ----------------
        from tdeed_tpu.infer.evaluate import evaluate
        from tdeed_tpu.infer.windows import VideoWindows
        from tdeed_tpu.train.step import make_predict_step

        windows = VideoWindows(
            "finediving",
            os.path.join(fixture["data_root"], "finediving", "train.json"),
            fixture["frame_dir"], CLIP_LEN,
            overlap_len=CLIP_LEN * 3 // 4, stride=1,
        )
        classes = {f"class{i}": i for i in range(1, NUM_CLASSES + 1)}

        if args.skip_jax:
            maps_j, tols = None, None
        else:
            predict = jax.jit(
                make_predict_step(model, crop_dim=None, radi_displacement=1),
                static_argnums=(3,),
            )
            jp, jbs = state.params, state.batch_stats

            def jax_pfn(frames, hflip=False):
                return np.asarray(
                    predict(jp, jbs, jnp.asarray(frames), hflip)[1]
                )

            maps_j, tols = evaluate(jax_pfn, windows, "TEST", classes,
                                    printed=False, test=True, augment=False)
        if args.skip_torch:
            maps_t = None
        else:
            maps_t, tols = evaluate(torch_predict_fn(oracle), windows, "TEST",
                                    classes, printed=False, test=True,
                                    augment=False)

    def tail(xs, n=20):
        return float(np.mean(xs[-n:]))

    res = {
        "steps": args.steps,
        "mixup": args.mixup,
        "perturb": args.perturb,
        "perturb_torch": args.perturb_torch,
        "tolerances": list(tols),
    }
    if not args.skip_jax:
        res.update({
            "loss0_jax": jl[0],
            "tail20_jax": tail(jl),
            "best_epoch_jax": int(np.argmin(jvl)) if jvl else None,
            "val_losses_jax": [round(v, 4) for v in jvl],
            "map_jax": round(float(np.mean(maps_j)), 4),
            "maps_per_tol_jax": [round(float(m), 4) for m in maps_j],
            "sec_jax": round(t_jax, 1),
        })
    if not args.skip_torch:
        res.update({
            "loss0_torch": tl[0],
            "tail20_torch": tail(tl),
            "best_epoch_torch": int(np.argmin(tvl)) if tvl else None,
            "val_losses_torch": [round(v, 4) for v in tvl],
            "map_torch": round(float(np.mean(maps_t)), 4),
            "maps_per_tol_torch": [round(float(m), 4) for m in maps_t],
            "sec_torch": round(t_torch, 1),
        })
    if not (args.skip_torch or args.skip_jax):
        res["loss0_rel"] = abs(tl[0] - jl[0]) / tl[0]
    print(json.dumps(res))
    if args.out:
        with open(args.out, "w") as fp:
            json.dump(res, fp, indent=2)
    return res


if __name__ == "__main__":
    main()
