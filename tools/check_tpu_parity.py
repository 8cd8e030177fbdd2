"""On-device parity checks for the Pallas kernels vs their XLA references.

Run on the real TPU: compares gsf_fused vs gsf_core, the fused photometric
kernel vs the XLA chain (same params), and sgp_branches vs the jnp
composition. Exit code 0 = all within tolerance.
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
from tdeed_tpu.kernels.gated_shift import gsf_core, gsf_fused  # noqa: E402
from tdeed_tpu.kernels.sgp import sgp_branches  # noqa: E402

rng = np.random.default_rng(0)
failures = []


def check(name, got, want, atol, rtol):
    got = np.asarray(got, np.float32)
    want = np.asarray(want, np.float32)
    err = np.max(np.abs(got - want) / (atol + rtol * np.abs(want)))
    ok = err <= 1.0
    print(f"{name}: max normalized err {err:.3f} {'OK' if ok else 'FAIL'}",
          flush=True)
    if not ok:
        failures.append(name)


def main():
    print("backend:", jax.default_backend(), flush=True)

    # --- GSF ----------------------------------------------------------
    B, T, H, W, C = 2, 8, 7, 7, 8
    x = jnp.asarray(rng.standard_normal((B, T, H, W, C)).astype(np.float32))
    xn = jax.nn.relu(x)
    gw = jnp.asarray(rng.standard_normal((3, 3, 3, C // 2, 2)).astype(np.float32) * 0.1)
    gb = jnp.asarray(rng.standard_normal((2,)).astype(np.float32) * 0.1)
    c1w = jnp.asarray(rng.standard_normal((3, 3, 2, 1)).astype(np.float32))
    c1b = jnp.asarray(rng.standard_normal((1,)).astype(np.float32))
    c2w = jnp.asarray(rng.standard_normal((3, 3, 2, 1)).astype(np.float32))
    c2b = jnp.asarray(rng.standard_normal((1,)).astype(np.float32))
    args = (x, xn, gw, gb, c1w, c1b, c2w, c2b)
    # the GSF kernel is hard-guarded off on hardware (known miscompile);
    # probe it under the experimental flag so this harness keeps tracking
    # whether a toolchain update fixes it, without failing the suite
    os.environ["TDEED_EXPERIMENTAL_GSF"] = "1"
    try:
        got = gsf_fused(*args, False)
        got_np = np.asarray(got, np.float32)
        want_np = np.asarray(gsf_core(*args), np.float32)
        err = np.max(np.abs(got_np - want_np) / (1e-4 + 1e-3 * np.abs(want_np)))
        print(f"gsf_fused (experimental): max normalized err {err:.3f} "
              f"{'OK' if err <= 1 else 'STILL MISCOMPILED (known, guarded off)'}",
              flush=True)
    except Exception as e:
        print(f"gsf_fused (experimental): {type(e).__name__}: {str(e)[:120]}",
              flush=True)
    finally:
        os.environ.pop("TDEED_EXPERIMENTAL_GSF", None)

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

    # --- SGP branches --------------------------------------------------
    B2, T2, C2, ks, up = 2, 16, 128, 3, 7
    x2 = jnp.asarray(rng.standard_normal((B2, T2, C2)).astype(np.float32))
    phi = jnp.asarray(rng.standard_normal((B2, 1, C2)).astype(np.float32))
    mk = lambda k: jnp.asarray(rng.standard_normal((k, C2)).astype(np.float32))
    wfc, bfc, wpsi, bpsi, wcw, bcw, wckw, bckw = (
        mk(1), mk(1), mk(ks), mk(1), mk(ks), mk(1), mk(up), mk(1)
    )

    def dw(x, w, b, k):
        pad = k // 2
        xp = jnp.pad(x, ((0, 0), (pad, pad), (0, 0)))
        out = jnp.broadcast_to(b[0], x.shape) + 0.0
        for j in range(k):
            out = out + w[j] * xp[:, j : j + T2, :]
        return out

    want = (wfc[0] * x2 + bfc[0]) * phi + (
        dw(x2, wcw, bcw, ks) + dw(x2, wckw, bckw, up)
    ) * dw(x2, wpsi, bpsi, ks) + x2
    got = sgp_branches(
        x2, phi, wfc, bfc, wpsi, bpsi, wcw, bcw, wckw, bckw, ks=ks, up=up
    )
    check("sgp_branches", got, want, 1e-4, 1e-3)

    if failures:
        print("FAILURES:", failures)
        sys.exit(1)
    print("ALL PARITY CHECKS PASSED")


if __name__ == "__main__":
    main()
