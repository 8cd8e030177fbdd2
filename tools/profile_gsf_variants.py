"""Cost ladder for the GSF gated shift inside the backbone fwd+bwd.

Times grad(sum(backbone(x))) on the TPU for a ladder of GatedShift
variants, isolating where the ~19 ms in-graph cost lives:
  none        — no shift modules at all
  bn          — BN+ReLU computed, output passthrough
  bn+gate     — + gate conv + tanh computed, output passthrough
  full-nointl — full GSF, interleave regroup skipped
  full        — production GSF
"""

from __future__ import annotations

import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tdeed_tpu.utils.profiling import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

from flax import linen as nn  # noqa: E402

import jax as _jax  # noqa: F401,E402

import tdeed_tpu.models.shift as shift_mod  # noqa: E402
from tdeed_tpu.models.regnet import RegNetY  # noqa: E402

B, T, S = 8, 100, 224


def timed_fwd_bwd(variant: str) -> float:
    from tdeed_tpu.kernels.gated_shift import gsf_gate, gsf_post_gate_ref
    from tdeed_tpu.models.shift import _ConvParams, _interleave_halves

    from typing import Any

    class VariantGSF(nn.Module):
        dtype: Any = jnp.bfloat16

        @nn.compact
        def __call__(self, x, train: bool):
            c = x.shape[-1]
            xn = nn.BatchNorm(
                use_running_average=not train, momentum=0.9, epsilon=1e-5,
                dtype=jnp.float32, name="bn",
            )(x.astype(jnp.float32))
            xn = nn.relu(xn).astype(x.dtype)
            if variant == "bn":
                return x + 0.0 * xn
            gate_w, gate_b = _ConvParams(
                (3, 3, 3, c // 2, 2), fan_in=(c // 2) * 27, name="gate_conv"
            )()
            ch1_w, ch1_b = _ConvParams((3, 3, 2, 1), 18, name="channel_conv1")()
            ch2_w, ch2_b = _ConvParams((3, 3, 2, 1), 18, name="channel_conv2")()
            f32 = jnp.float32
            if variant.startswith("pad"):
                # pad output channels: K per group instead of 1; XLA tiles
                # the conv + its gradients far better, zeros sliced away
                k = int(variant[3:])
                w = gate_w.astype(f32)
                wide = jnp.zeros((3, 3, 3, c // 2, 2 * k), f32)
                wide = wide.at[..., 0].set(w[..., 0])
                wide = wide.at[..., k].set(w[..., 1])
                out_wide = jax.lax.conv_general_dilated(
                    xn.astype(f32), wide, (1, 1, 1), "SAME",
                    dimension_numbers=("NTHWC", "THWIO", "NTHWC"),
                    feature_group_count=2,
                )
                gate = jnp.tanh(
                    jnp.stack([out_wide[..., 0], out_wide[..., k]], axis=-1)
                    + gate_b.astype(f32)
                )
            else:
                gate = gsf_gate(xn, gate_w.astype(f32), gate_b.astype(f32))
            if variant == "bn+gate":
                return x + 0.0 * gate.astype(x.dtype).sum(-1, keepdims=True)
            out = gsf_post_gate_ref(
                x, gate, ch1_w.astype(f32), ch1_b.astype(f32),
                ch2_w.astype(f32), ch2_b.astype(f32),
            ).astype(x.dtype)
            if variant == "full-nointl":
                return out
            return _interleave_halves(out[..., : c // 2], out[..., c // 2:])

    orig = shift_mod.GSF
    if variant != "none":
        shift_mod.GSF = VariantGSF
    try:
        bb = RegNetY(
            arch="rny002",
            shift_mode=None if variant == "none" else "gsf",
            clip_len=T,
            dtype=jnp.bfloat16,
        )
        r = np.random.default_rng(0)
        x = jnp.asarray(
            r.integers(0, 256, (B * T, S, S, 3)).astype(np.float32) / 255.0
        ).astype(jnp.bfloat16)
        variables = jax.jit(bb.init, static_argnums=(2,))(
            jax.random.PRNGKey(0), x, False
        )

        def loss(params, x):
            out, _ = bb.apply(
                {"params": params, "batch_stats": variables["batch_stats"]},
                x, True, mutable=["batch_stats"],
            )
            return jnp.mean(out.astype(jnp.float32))

        @jax.jit
        def step(params, x):
            l, g = jax.value_and_grad(loss)(params, x)
            # REAL SGD update inside the same program: a vanishing update
            # rounds to bit-identical params and the runtime then
            # deduplicates the whole dispatch
            return jax.tree.map(lambda a, b: a - 1e-3 * b, params, g), l

        p = variables["params"]
        p, l0 = step(p, x)
        jax.block_until_ready(l0)
        t0 = time.perf_counter()
        n = 10
        for _ in range(n):
            p, l = step(p, x)
        jax.block_until_ready(l)
        assert float(l) != float(l0), "loss did not change - dedup suspected"
        return (time.perf_counter() - t0) / n
    finally:
        shift_mod.GSF = orig


def main():
    # first timed program in a fresh process is a warmup artifact — the
    # leading duplicate is a throwaway. pad8/pad64 (output-channel-padded
    # gate conv) measured WORSE than the plain conv (116/122 vs 109 ms).
    for variant in ("full", "none", "bn", "bn+gate", "full-nointl", "full"):
        try:
            sec = timed_fwd_bwd(variant)
            print(f"backbone fwd+bwd [{variant:12s}]: {sec*1e3:8.2f} ms",
                  flush=True)
        except Exception as e:
            print(f"backbone fwd+bwd [{variant:12s}]: FAILED "
                  f"{type(e).__name__}: {str(e)[:150]}", flush=True)


if __name__ == "__main__":
    main()
