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


def check(name, got, want, atol, rtol, isolated_ok: bool = False):
    """Normalized max-error check.

    isolated_ok: tolerate ISOLATED entry flips (<=4% of entries, median
    ratio ~1) — for cancellation-dominated reductions (the stem-side dW /
    BN-scale sums) where two valid bf16 evaluation orders (plain autodiff
    vs the restructured custom VJP, XLA:TPU's fusion order vs XLA:CPU's)
    legitimately differ by O(1) relative at single entries whose exact sum
    sits near zero (measured round 4: jnp-fused vs plain ON DEVICE flips
    1/64..8/216 = 3.7% entries with med-ratio 1.000; the same comparison
    passes entrywise on CPU). A systematic error still fails: it moves the
    median ratio or flips many entries."""
    got = np.asarray(got, np.float32)
    want = np.asarray(want, np.float32)
    bad = np.abs(got - want) / (atol + rtol * np.abs(want)) > 1.0
    err = np.max(np.abs(got - want) / (atol + rtol * np.abs(want)))
    ok = err <= 1.0
    sel = np.abs(want) > 0.1 * np.abs(want).max() + 1e-6
    ratio = np.median(got[sel] / want[sel]) if sel.any() else float("nan")
    nbad = int(bad.sum())
    extra = ""
    verdict = "OK"
    if not ok:
        extra = f"  med-ratio {ratio:.4f} nbad={nbad}/{got.size}"
        if (isolated_ok and nbad <= max(1, int(0.04 * got.size))
                and abs(ratio - 1.0) < 5e-3):
            verdict = "OK (isolated flips)"
        else:
            verdict = "FAIL"
            failures.append(name)
    print(f"{name}: max normalized err {err:.3f} {verdict}{extra}",
          flush=True)


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

    # --- fused entry block (jnp custom VJP) vs plain flax, ON DEVICE ----
    # The CPU suite (tests/test_fused_block.py) gates the math; this checks
    # the same comparison under XLA:TPU's bf16 rounding/fusion order.
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
        params = variables["params"]
        p = {"blk": params["blk"]}
        if with_stem:
            p["stem"] = params["stem"]
        hw = 8 if with_stem else 16  # one stride-2 fewer without the stem
        w = jnp.asarray(rng.standard_normal((24, hw, hw, BLK_W)), jnp.float32)
        fn = make_fused_block(groups=BLK_W // GROUP_SIZE, with_stem=with_stem)

        def loss_fused(pp, xx):
            out, _ = fn(xx, pp)
            return jnp.sum(out.astype(jnp.float32) * w)

        def loss_plain(pp, xx):
            out, _ = model.apply(
                {"params": pp, "batch_stats": variables["batch_stats"]},
                xx, True, mutable=["batch_stats"],
            )
            return jnp.sum(out.astype(jnp.float32) * w)

        g_fused = jax.jit(jax.grad(loss_fused, argnums=(0, 1)))(p, xb)
        g_plain_full = jax.jit(jax.grad(loss_plain, argnums=(0, 1)))(
            params, xb
        )
        gp = {"blk": g_plain_full[0]["blk"]}
        if with_stem:
            gp["stem"] = g_plain_full[0]["stem"]
        flat_j = jax.tree_util.tree_flatten_with_path((gp, g_plain_full[1]))[0]
        flat_p = dict(jax.tree_util.tree_flatten_with_path(g_fused)[0])
        for path, leaf in flat_j:
            check(
                f"fused_block stem={with_stem} grad{jax.tree_util.keystr(path)}",
                flat_p[path], leaf, 2e-2, 2e-2, isolated_ok=True,
            )

    if failures:
        print("FAILURES:", failures)
        sys.exit(1)
    print("ALL PARITY CHECKS PASSED")


if __name__ == "__main__":
    main()
