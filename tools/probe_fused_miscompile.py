"""Isolate the Mosaic miscompile in the fused-block P2 backward.

On-device parity (tools/check_tpu_parity.py) fails exactly the outputs
that flow through the in-kernel affine `v * c0 + c1` where (c0, c1) are
broadcast from a (2, C, 1) VMEM const ref (dv1 -> dW1/dx; the recomputed
stem xin -> dWd/stem sums), while the broadcast-free output (stem=False
dWd) is exact. Interpret mode is bit-exact, so the math is right and a
lowering is wrong.

This probe runs, in ONE device claim:
  1. mini-kernels isolating each suspect construct (bf16 (C,1) lane
     broadcast, f32 (C,1) broadcast, pre-broadcast consts, where/& masks,
     the full dv1 expression) at both the parity-test geometry (C=8,
     N=24 — sub-tile everywhere) and a production-like one (C=24, N=256);
  2. the full `_p2_pallas_call` compiled vs interpret on identical inputs,
     per-output max-err.
"""

from __future__ import annotations

import functools
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tdeed_tpu.utils.profiling import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

from tdeed_tpu.kernels.fused_block import _p2_pallas_call  # noqa: E402

bf16 = jnp.bfloat16
f32 = jnp.float32


def report(name, got, want):
    got = np.asarray(got, np.float32)
    want = np.asarray(want, np.float32)
    d = np.abs(got - want)
    err = float(np.max(d))
    scale = float(np.max(np.abs(want))) or 1.0
    ok = err <= 1e-2 * scale
    loc = ""
    if not ok:
        idx = np.unravel_index(np.argmax(d), d.shape)
        nbad = int((d > 1e-2 * scale).sum())
        loc = f"  at {idx} nbad={nbad}/{d.size}"
    print(f"  {name:34s} maxerr {err:10.4g}  {'OK' if ok else 'FAIL'}{loc}",
          flush=True)
    return ok


def mini(name, kind, C, Nn, W=16):
    """One (W, C, Nn) block, fori over rows — mirrors the P2 inner loop."""
    r = np.random.default_rng(hash((kind, C, Nn)) % 2**32)
    v = jnp.asarray(r.standard_normal((W, C, Nn)), bf16)
    g = jnp.asarray(r.standard_normal((W, C, Nn)), bf16)
    ab = jnp.asarray(r.standard_normal((2, C, 1)), bf16)
    kk = jnp.asarray(r.standard_normal((2, C, 1)) * 0.1, f32)
    ab_b = jnp.broadcast_to(ab, (2, C, Nn))
    ab_f = ab.astype(f32)

    def kernel(ab_ref, kk_ref, v_ref, g_ref, o_ref):
        if kind == "affine_bcast":
            a1, b1 = ab_ref[0], ab_ref[1]          # (C, Nn) pre-broadcast
        elif kind == "affine_f32c1":
            a1 = ab_ref[0].astype(bf16)            # f32 (C,1) -> bf16
            b1 = ab_ref[1].astype(bf16)
        else:
            a1, b1 = ab_ref[0], ab_ref[1]          # bf16 (C, 1)
        k1, k0 = kk_ref[0], kk_ref[1]

        def body(i, _):
            vv = v_ref[i]
            pre = vv * a1 + b1
            if kind.startswith("affine"):
                o_ref[i] = pre
            elif kind == "relu":
                o_ref[i] = jnp.maximum(pre, jnp.zeros((), bf16))
            elif kind == "dz":
                ok = jax.lax.broadcasted_iota(jnp.int32, (C, Nn), 1) < Nn
                o_ref[i] = jnp.where(
                    (pre.astype(f32) > 0) & ok, g_ref[i], jnp.zeros((), bf16)
                )
            elif kind == "dv1":
                ok = jax.lax.broadcasted_iota(jnp.int32, (C, Nn), 1) < Nn
                dz = jnp.where(
                    (pre.astype(f32) > 0) & ok, g_ref[i], jnp.zeros((), bf16)
                )
                dv1 = dz * a1 + (vv.astype(f32) * k1 + k0).astype(bf16)
                o_ref[i] = jnp.where(ok, dv1, jnp.zeros((), bf16))
            return 0

        jax.lax.fori_loop(0, W, body, 0)

    abin = {"affine_bcast": ab_b, "affine_f32c1": ab_f}.get(kind, ab)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((W, C, Nn), bf16),
        interpret=INTERPRET,
    )(abin, kk, v, g)

    # jnp oracle (bit-exact bf16 math)
    a1o = ab[0]
    b1o = ab[1]
    pre = v * a1o + b1o
    if kind.startswith("affine"):
        want = pre
    elif kind == "relu":
        want = jnp.maximum(pre, jnp.zeros((), bf16))
    elif kind == "dz":
        want = jnp.where(pre.astype(f32) > 0, g, jnp.zeros((), bf16))
    elif kind == "dv1":
        dz = jnp.where(pre.astype(f32) > 0, g, jnp.zeros((), bf16))
        want = dz * a1o + (v.astype(f32) * kk[0] + kk[1]).astype(bf16)
    return report(name, out, want)


def full_p2(with_stem, debug=None):
    """_p2_pallas_call compiled vs interpret on identical synthetic inputs."""
    r = np.random.default_rng(7 if with_stem else 8)
    C, Cin, Nn = 8, (3 if with_stem else 8), 24
    H = W = 16
    v1t = jnp.asarray(r.standard_normal((H, W, C, Nn)), bf16)
    g1t = jnp.asarray(r.standard_normal((H, W, C, Nn)), bf16)
    xt = jnp.asarray(r.standard_normal((H, W, Cin, Nn)), bf16)
    dvdt = jnp.asarray(r.standard_normal((H // 2, W // 2, C, Nn)), bf16)
    ab1 = jnp.asarray(r.standard_normal((2, C, 1)), bf16)
    kk = jnp.asarray(r.standard_normal((2, C, 1)) * 0.1, f32)
    asbs = jnp.asarray(r.standard_normal((2, Cin, 1)), bf16) if with_stem else None
    w1 = jnp.asarray(r.standard_normal((Cin, C)), bf16)
    wd = jnp.asarray(r.standard_normal((Cin, C)), bf16)

    call = functools.partial(
        _p2_pallas_call, v1t, g1t, xt, dvdt, ab1, kk, asbs, w1, wd,
        with_stem=with_stem, _debug=debug, rounding="single",
    )
    got = jax.jit(lambda: call(interpret=INTERPRET))()
    want = call(interpret=True)
    names = ["dx", "dW1", "dWd"]  # stem BN sums moved to XLA (fused_bwd)
    allok = True
    tag = f"p2[stem={with_stem}{',' + debug if debug else ''}]"
    for nm, gg, ww in zip(names, got, want):
        allok &= report(f"{tag} {nm}", gg, ww)
    return allok


INTERPRET = False


def semantics():
    """Where does XLA:TPU round bf16 in the fused_bwd jnp chains?

    The kernel must mirror the COMPILED jnp path (not op-by-op jnp): XLA's
    bf16 propagation may keep intermediates in f32 inside fusions. Compare
    the jitted chains against single-rounded vs per-op-rounded references.
    """
    import ml_dtypes

    r = np.random.default_rng(5)
    n = 1 << 20
    dz = jnp.asarray(r.standard_normal(n), bf16)
    v = jnp.asarray(r.standard_normal(n), bf16)
    a1 = jnp.bfloat16(0.73)
    k1 = jnp.float32(0.0173)
    k0 = jnp.float32(-0.0081)

    def rnd(x):
        return np.asarray(x, np.float32).astype(ml_dtypes.bfloat16).astype(np.float32)

    @jax.jit
    def xla_dv1(dz, v):
        t = (v.astype(f32) * k1 + k0).astype(bf16)
        return dz * a1 + t

    got = np.asarray(xla_dv1(dz, v), np.float32)
    dzf = np.asarray(dz, np.float32)
    vf = np.asarray(v, np.float32)
    af = np.float32(a1)
    single = rnd(dzf * af + (vf * np.float32(k1) + np.float32(k0)))
    triple = rnd(rnd(dzf * af) + rnd(vf * np.float32(k1) + np.float32(k0)))
    print(f"  dv1 chain: vs single-round {int((got != single).sum())}/{n}"
          f"  vs per-op-round {int((got != triple).sum())}/{n} mismatches",
          flush=True)

    # stem pre-relu mask + xin value
    a_s = jnp.bfloat16(1.17)
    b_s = jnp.bfloat16(-0.42)
    # densely sample around the kink
    vs = jnp.asarray(
        (0.42 / 1.17) * (1.0 + r.standard_normal(n) * 2e-3), bf16
    )

    @jax.jit
    def xla_stem(vs):
        pres = vs * a_s + b_s
        xin = jax.nn.relu(pres)
        mask = pres > 0
        return xin, mask

    xin_x, mask_x = xla_stem(vs)
    xin_x = np.asarray(xin_x, np.float32)
    mask_x = np.asarray(mask_x)
    vsf = np.asarray(vs, np.float32)
    pres_f = vsf * np.float32(a_s) + np.float32(b_s)      # unrounded f32
    pres_b = rnd(rnd(vsf * np.float32(a_s)) + np.float32(b_s))  # per-op
    for nm, m in (("f32-unrounded", pres_f > 0), ("per-op-bf16", pres_b > 0)):
        print(f"  stem mask vs {nm}: {int((mask_x != m).sum())}/{n} flips",
              flush=True)
    for nm, x_ in (("rnd(max(f32,0))", rnd(np.maximum(pres_f, 0))),
                   ("per-op bf16", rnd(np.maximum(pres_b, 0)))):
        print(f"  stem xin vs {nm}: {int((xin_x != x_).sum())}/{n} mismatches",
              flush=True)


def main():
    global INTERPRET
    # CPU sanity mode: interpret everywhere (validates the script, not Mosaic)
    INTERPRET = jax.default_backend() == "cpu"
    print("backend:", jax.default_backend(), "interpret:", INTERPRET, flush=True)
    print("-- XLA bf16 rounding semantics", flush=True)
    semantics()
    if os.environ.get("PROBE_SEMANTICS_ONLY") == "1":
        return
    for C, Nn in ((8, 24), (24, 256)):
        print(f"-- mini kernels C={C} N={Nn}", flush=True)
        for kind in ("affine_c1", "affine_bcast", "affine_f32c1",
                     "relu", "dz", "dv1"):
            mini(f"{kind}", kind, C, Nn)
    print("-- full P2 compiled vs interpret", flush=True)
    full_p2(False)
    full_p2(True)
    print("-- P2 debug taps (dx output rerouted)", flush=True)
    for tap in ("v", "a1b", "okc", "dz", "dv1", "xin", "dot1", "dotd"):
        full_p2(False, debug=tap)


if __name__ == "__main__":
    main()
