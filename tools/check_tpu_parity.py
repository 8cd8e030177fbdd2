"""On-device parity checks for the TPU compute paths vs their references.

Run on the real TPU: compares the factored GSF gate vs the direct conv
lowering, the full gsf_core on-device vs CPU-style fp32 math, and the
fused photometric Pallas kernel vs the XLA chain (same params). Exit
code 0 = all within tolerance.
"""

from __future__ import annotations

import os
import sys

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tdeed_tpu.utils.profiling import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

from tdeed_tpu.kernels.augment import (  # noqa: E402
    N_PARAMS,
    photometric_planar,
)
from tdeed_tpu.kernels.gated_shift import (  # noqa: E402
    gsf_core,
    gsf_gate,
    gsf_gate_conv,
)

rng = np.random.default_rng(0)
failures = []


def check(name, got, want, atol, rtol):
    got = np.asarray(got, np.float32)
    want = np.asarray(want, np.float32)
    err = np.max(np.abs(got - want) / (atol + rtol * np.abs(want)))
    ok = err <= 1.0
    extra = ""
    if not ok:
        sel = np.abs(want) > 0.1 * np.abs(want).max() + 1e-6
        ratio = np.median(got[sel] / want[sel]) if sel.any() else float("nan")
        nbad = int((np.abs(got - want) / (atol + rtol * np.abs(want)) > 1).sum())
        extra = f"  med-ratio {ratio:.4f} nbad={nbad}/{got.size}"
    print(f"{name}: max normalized err {err:.3f} {'OK' if ok else 'FAIL'}{extra}",
          flush=True)
    if not ok:
        failures.append(name)


def main():
    print("backend:", jax.default_backend(), flush=True)

    # --- GSF gate: factored (production) vs direct conv -----------------
    B, T, H, W, C = 2, 8, 7, 7, 8
    x = jnp.asarray(rng.standard_normal((B, T, H, W, C)).astype(np.float32))
    xn = jax.nn.relu(x)
    gw = jnp.asarray(rng.standard_normal((3, 3, 3, C // 2, 2)).astype(np.float32) * 0.1)
    gb = jnp.asarray(rng.standard_normal((2,)).astype(np.float32) * 0.1)
    check(
        "gsf_gate factored-vs-conv (fp32)",
        jax.jit(gsf_gate)(xn, gw, gb),
        jax.jit(gsf_gate_conv)(xn, gw, gb),
        1e-5, 1e-4,
    )
    check(
        "gsf_gate factored-vs-conv (bf16 in)",
        jax.jit(gsf_gate)(xn.astype(jnp.bfloat16), gw, gb),
        jax.jit(gsf_gate_conv)(xn.astype(jnp.bfloat16), gw, gb),
        2e-2, 2e-2,
    )

    # --- full GSF core: jitted vs op-by-op on device ---------------------
    c1w = jnp.asarray(rng.standard_normal((3, 3, 2, 1)).astype(np.float32))
    c1b = jnp.asarray(rng.standard_normal((1,)).astype(np.float32))
    c2w = jnp.asarray(rng.standard_normal((3, 3, 2, 1)).astype(np.float32))
    c2b = jnp.asarray(rng.standard_normal((1,)).astype(np.float32))
    args = (x, xn, gw, gb, c1w, c1b, c2w, c2b)
    check(
        "gsf_core jit-vs-eager",
        jax.jit(gsf_core)(*args),
        gsf_core(*args),
        1e-4, 1e-3,
    )

    # --- photometric ---------------------------------------------------
    from tests.test_augment_kernel import _xla_chain

    frames = rng.integers(0, 256, (2, 3, 16, 16, 3)).astype(np.uint8)
    params = np.zeros((2, N_PARAMS), np.float32)
    params[:, [0, 2, 4, 6, 8]] = 1.0
    params[:, 1] = 0.1
    params[:, 3] = 0.9
    params[:, 5] = 1.1
    params[:, 7] = 0.85
    taps = np.exp(-0.5 * (np.arange(-2, 3) / 1.2) ** 2)
    params[:, 9:14] = taps / taps.sum()
    planar = jnp.transpose(jnp.asarray(frames), (0, 1, 4, 2, 3))
    got = jnp.transpose(
        photometric_planar(planar, jnp.asarray(params)), (0, 1, 3, 4, 2)
    ).astype(jnp.float32)
    want = _xla_chain(jnp.asarray(frames), params)
    check("photometric", got, want, 3e-2, 3e-2)

    # in-kernel hflip (slot 14): lane reversal must survive Mosaic compile
    params[:, 14] = [1.0, 0.0]
    got = jnp.transpose(
        photometric_planar(planar, jnp.asarray(params)), (0, 1, 3, 4, 2)
    ).astype(jnp.float32)
    flipped = frames.copy()
    flipped[0] = flipped[0][:, :, ::-1]
    want = _xla_chain(jnp.asarray(flipped), params)
    check("photometric + in-kernel flip", got, want, 3e-2, 3e-2)

    # --- fused entry block: Pallas P2 backward vs jnp two-pass ----------
    # Both run on this device in bf16; the jnp formulation is the oracle
    # (itself gated vs flax autodiff in tests/test_fused_block.py).
    from tests.test_fused_block import BLK_W, GROUP_SIZE, PlainStemBlock
    from tdeed_tpu.kernels.fused_block import make_fused_block

    for with_stem in (True, False):
        cin = 3 if with_stem else 8
        xb = jnp.asarray(
            rng.standard_normal((24, 32, 32, cin)), jnp.bfloat16
        )
        model = PlainStemBlock(dtype=jnp.bfloat16, with_stem=with_stem)
        variables = jax.jit(model.init, static_argnums=(2,))(
            jax.random.PRNGKey(1), xb, False
        )
        p = {"blk": variables["params"]["blk"]}
        if with_stem:
            p["stem"] = variables["params"]["stem"]
        hw = 8 if with_stem else 16  # one stride-2 fewer without the stem
        w = jnp.asarray(rng.standard_normal((24, hw, hw, BLK_W)), jnp.float32)
        grads = {}
        for up in (False, True):
            fn = make_fused_block(
                groups=BLK_W // GROUP_SIZE, with_stem=with_stem, use_pallas=up
            )

            def loss(pp, xx, fn=fn):
                out, _ = fn(xx, pp)
                return jnp.sum(out.astype(jnp.float32) * w)

            grads[up] = jax.jit(jax.grad(loss, argnums=(0, 1)))(p, xb)
        flat_j = jax.tree_util.tree_flatten_with_path(grads[False])[0]
        flat_p = dict(jax.tree_util.tree_flatten_with_path(grads[True])[0])
        for path, leaf in flat_j:
            check(
                f"fused_block stem={with_stem} grad{jax.tree_util.keystr(path)}",
                flat_p[path], leaf, 2e-2, 2e-2,
            )

    # --- fused shift block: Pallas P2 (two-input variant) vs jnp --------
    from tests.test_fused_block import STEM_W
    from tdeed_tpu.kernels.fused_block import make_fused_shift_block
    from tdeed_tpu.models.regnet import YBlock

    # hw=14 covers the odd-wb (W = 2 mod 4) downsample gating — s4_b1's
    # row geometry at 224^2 crops
    for hw in (32, 14):
        xs = jnp.asarray(rng.standard_normal((24, hw, hw, STEM_W)), jnp.bfloat16)
        xd = jnp.asarray(rng.standard_normal((24, hw, hw, STEM_W)), jnp.bfloat16)
        donor = YBlock(
            width=BLK_W, in_width=STEM_W, stride=2, group_size=GROUP_SIZE,
            dtype=jnp.bfloat16,
        )
        donor_params = jax.jit(donor.init, static_argnums=(2,))(
            jax.random.PRNGKey(4), xd, False
        )["params"]
        sp = {"blk": {k: donor_params[k]
                      for k in ("conv1", "conv2", "se", "conv3", "downsample")}}
        ws = jnp.asarray(
            rng.standard_normal((24, hw // 2, hw // 2, BLK_W)), jnp.float32
        )
        sgrads = {}
        for up in (False, True):
            fn = make_fused_shift_block(groups=BLK_W // GROUP_SIZE, use_pallas=up)

            def loss(pp, a, b, fn=fn, ws=ws):
                out, _ = fn(a, b, pp)
                return jnp.sum(out.astype(jnp.float32) * ws)

            sgrads[up] = jax.jit(jax.grad(loss, argnums=(0, 1, 2)))(sp, xs, xd)
        flat_j = jax.tree_util.tree_flatten_with_path(sgrads[False])[0]
        flat_p = dict(jax.tree_util.tree_flatten_with_path(sgrads[True])[0])
        for path, leaf in flat_j:
            check(
                f"fused_shift hw={hw} grad{jax.tree_util.keystr(path)}",
                flat_p[path], leaf, 2e-2, 2e-2,
            )

    # --- fused conv1 unit (stride-1 blocks): Pallas P2 vs jnp -----------
    from tdeed_tpu.kernels.fused_block import make_fused_conv_bn_relu

    xc = jnp.asarray(rng.standard_normal((24, 32, 32, STEM_W)), jnp.bfloat16)
    cp = {
        "conv": {"kernel": jnp.asarray(
            rng.standard_normal((1, 1, STEM_W, BLK_W)) * 0.2, jnp.float32
        )},
        "bn": {
            "scale": 1.0 + 0.1 * jnp.arange(BLK_W, dtype=jnp.float32) / BLK_W,
            "bias": 0.05 * jnp.arange(BLK_W, dtype=jnp.float32) / BLK_W,
        },
    }
    wc = jnp.asarray(rng.standard_normal((24, 32, 32, BLK_W)), jnp.float32)
    cgrads = {}
    for up in (False, True):
        fn = make_fused_conv_bn_relu(use_pallas=up)

        def loss(pp, a, fn=fn):
            out, _ = fn(a, pp)
            return jnp.sum(out.astype(jnp.float32) * wc)

        cgrads[up] = jax.jit(jax.grad(loss, argnums=(0, 1)))(cp, xc)
    flat_j = jax.tree_util.tree_flatten_with_path(cgrads[False])[0]
    flat_p = dict(jax.tree_util.tree_flatten_with_path(cgrads[True])[0])
    for path, leaf in flat_j:
        check(
            f"fused_conv1 grad{jax.tree_util.keystr(path)}",
            flat_p[path], leaf, 2e-2, 2e-2,
        )

    if failures:
        print("FAILURES:", failures)
        sys.exit(1)
    print("ALL PARITY CHECKS PASSED")


if __name__ == "__main__":
    main()
