"""Fused early-block custom-vjp vs the plain flax composition.

The fused path (tdeed_tpu/kernels/fused_block.py) must reproduce the
production modules — stem ConvBN + stride-2 YBlock (models/regnet.py) —
in forward values, batch-stat updates, and gradients w.r.t. every
parameter and the input, in both fp32 and bf16. The backward is a
hand-derived restructure (BN-through-stats included), so this is the
ground-truth gate for the math. (The single-pass Pallas P2 lowering this
suite once also gated was measured NEGATIVE on device and pruned —
see kernels/fused_block.py module docstring and docs/DESIGN.md.)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from flax import linen as nn

from tdeed_tpu.kernels.fused_block import make_fused_block
from tdeed_tpu.models.regnet import ConvBN, RegNetY, YBlock

STEM_W = 8
BLK_W = 8
GROUP_SIZE = 4  # groups = BLK_W // GROUP_SIZE = 2
N, H = 4, 16


class PlainStemBlock(nn.Module):
    dtype: object = None
    with_stem: bool = True

    @nn.compact
    def __call__(self, x, train: bool):
        if self.with_stem:
            x = ConvBN(STEM_W, 3, strides=2, dtype=self.dtype, name="stem")(x, train)
        x = YBlock(
            width=BLK_W,
            in_width=STEM_W,
            stride=2,
            group_size=GROUP_SIZE,
            dtype=self.dtype,
            name="blk",
        )(x, train)
        return x


def _setup(dtype, with_stem):
    rng = np.random.default_rng(0)
    if with_stem:
        x = jnp.asarray(rng.normal(size=(N, H, H, 3)), dtype or jnp.float32)
    else:
        x = jnp.asarray(rng.normal(size=(N, H, H, STEM_W)), dtype or jnp.float32)
    model = PlainStemBlock(dtype=dtype, with_stem=with_stem)
    variables = model.init(jax.random.PRNGKey(1), x, False)
    # non-trivial BN params so stat gradients actually matter
    params = jax.tree.map(
        lambda a: a + 0.05 * jnp.arange(a.size, dtype=a.dtype).reshape(a.shape) / a.size,
        variables["params"],
    )
    fused = make_fused_block(groups=BLK_W // GROUP_SIZE, with_stem=with_stem)
    fused_p = dict(params)
    if with_stem:
        fused_p = {"stem": params["stem"], "blk": params["blk"]}
    else:
        fused_p = {"blk": params["blk"]}
    return model, variables, params, fused, fused_p, x


def _tols(dtype):
    return dict(rtol=2e-2, atol=2e-2) if dtype == jnp.bfloat16 else dict(rtol=2e-5, atol=1e-5)


@pytest.mark.parametrize("dtype", [None, jnp.bfloat16])
@pytest.mark.parametrize("with_stem", [True, False])
def test_forward_and_stats_match(dtype, with_stem):
    model, variables, params, fused, fused_p, x = _setup(dtype, with_stem)
    out_plain, upd = model.apply(
        {"params": params, "batch_stats": variables["batch_stats"]},
        x, True, mutable=["batch_stats"],
    )
    out_fused, stats = fused(x, fused_p)
    np.testing.assert_allclose(
        np.asarray(out_plain, np.float32), np.asarray(out_fused, np.float32),
        **_tols(dtype),
    )
    # running updates: new = 0.9 old + 0.1 batch (SplitBatchNorm momentum)
    old = variables["batch_stats"]
    layers = {
        "conv1": ("blk", "conv1"), "conv2": ("blk", "conv2"),
        "conv3": ("blk", "conv3"), "downsample": ("blk", "downsample"),
    }
    if with_stem:
        layers["stem"] = ("stem",)
    for key, path in layers.items():
        node_new = upd["batch_stats"]
        node_old = old
        for p_ in path:
            node_new, node_old = node_new[p_], node_old[p_]
        m, v = stats[key]
        np.testing.assert_allclose(
            np.asarray(node_new["bn"]["mean"]),
            np.asarray(0.9 * node_old["bn"]["mean"] + 0.1 * m),
            **_tols(dtype),
        )
        np.testing.assert_allclose(
            np.asarray(node_new["bn"]["var"]),
            np.asarray(0.9 * node_old["bn"]["var"] + 0.1 * v),
            **_tols(dtype),
        )


@pytest.mark.parametrize("dtype", [None, jnp.bfloat16])
@pytest.mark.parametrize("with_stem", [True, False])
def test_gradients_match(dtype, with_stem):
    model, variables, params, fused, fused_p, x = _setup(dtype, with_stem)
    rng = np.random.default_rng(7)

    def probe(out):
        w = jnp.asarray(rng.normal(size=out.shape), jnp.float32)
        return jnp.sum(out.astype(jnp.float32) * w)

    rng = np.random.default_rng(7)

    def loss_plain(p, x_):
        out, _ = model.apply(
            {"params": p, "batch_stats": variables["batch_stats"]},
            x_, True, mutable=["batch_stats"],
        )
        return probe(out)

    rng = np.random.default_rng(7)

    def loss_fused(p, x_):
        fp = {"stem": p["stem"], "blk": p["blk"]} if with_stem else {"blk": p["blk"]}
        out, _ = fused(x_, fp)
        return probe(out)

    rng = np.random.default_rng(7)
    gp_plain, gx_plain = jax.grad(loss_plain, argnums=(0, 1))(params, x)
    rng = np.random.default_rng(7)
    gp_fused, gx_fused = jax.grad(loss_fused, argnums=(0, 1))(params, x)

    flat_p, _ = jax.tree_util.tree_flatten_with_path(gp_plain)
    flat_f = dict(jax.tree_util.tree_flatten_with_path(gp_fused)[0])
    tols = _tols(dtype)
    for path, leaf in flat_p:
        got = flat_f[path]
        ref = np.asarray(leaf, np.float32)
        den = max(1e-3, float(np.abs(ref).max()))
        err = float(np.abs(np.asarray(got, np.float32) - ref).max()) / den
        assert err < tols["rtol"] * 5 + 1e-6, (
            f"{jax.tree_util.keystr(path)}: rel err {err:.3e}"
        )
    np.testing.assert_allclose(
        np.asarray(gx_plain, np.float32), np.asarray(gx_fused, np.float32),
        **tols,
    )


@pytest.mark.parametrize("dtype", [None, jnp.bfloat16])
def test_regnet_fuse_entry_equivalence(dtype):
    """Full rny002 trunk (gsf shift in s3/s4): fuse_entry=True must match the
    plain trunk in forward, every running-stat update, and every gradient."""
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(4, 16, 16, 3)), dtype or jnp.float32)

    def build(fuse):
        return RegNetY(
            arch="rny002", shift_mode="gsf", clip_len=2, fuse_entry=fuse,
            dtype=dtype,
        )

    plain, fused = build(False), build(True)
    variables = plain.init(jax.random.PRNGKey(0), x, False)
    # fused init must produce the identical tree (it takes the plain path)
    v2 = fused.init(jax.random.PRNGKey(0), x, False)
    assert jax.tree_util.tree_structure(variables) == jax.tree_util.tree_structure(v2)

    out_p, upd_p = plain.apply(variables, x, True, mutable=["batch_stats"])
    out_f, upd_f = fused.apply(variables, x, True, mutable=["batch_stats"])
    tols = _tols(dtype)
    np.testing.assert_allclose(
        np.asarray(out_p, np.float32), np.asarray(out_f, np.float32), **tols
    )
    assert jax.tree_util.tree_structure(upd_p) == jax.tree_util.tree_structure(upd_f)
    for (path, a), (_, b) in zip(
        jax.tree_util.tree_flatten_with_path(upd_p)[0],
        jax.tree_util.tree_flatten_with_path(upd_f)[0],
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), err_msg=jax.tree_util.keystr(path), **tols
        )

    w = jnp.asarray(rng.normal(size=out_p.shape), jnp.float32)

    def loss(model):
        def f(p, x_):
            out, _ = model.apply(
                {"params": p, "batch_stats": variables["batch_stats"]},
                x_, True, mutable=["batch_stats"],
            )
            return jnp.sum(out.astype(jnp.float32) * w)
        return f

    gp_p, gx_p = jax.grad(loss(plain), argnums=(0, 1))(variables["params"], x)
    gp_f, gx_f = jax.grad(loss(fused), argnums=(0, 1))(variables["params"], x)
    flat_f = dict(jax.tree_util.tree_flatten_with_path(gp_f)[0])
    for path, leaf in jax.tree_util.tree_flatten_with_path(gp_p)[0]:
        ref = np.asarray(leaf, np.float32)
        got = np.asarray(flat_f[path], np.float32)
        den = max(1e-3, float(np.abs(ref).max()))
        err = float(np.abs(got - ref).max()) / den
        assert err < tols["rtol"] * 5 + 1e-6, (
            f"{jax.tree_util.keystr(path)}: rel err {err:.3e}"
        )
    # input grad: fp32 reduction-order noise scales with |g|~1e5 here, so
    # compare max-relative like the params, not elementwise allclose
    ref = np.asarray(gx_p, np.float32)
    got = np.asarray(gx_f, np.float32)
    err = float(np.abs(got - ref).max()) / max(1e-3, float(np.abs(ref).max()))
    assert err < tols["rtol"] * 5 + 1e-6, f"input grad rel err {err:.3e}"



@pytest.mark.parametrize("dtype", [None, jnp.bfloat16])
def test_shift_block_fused_vs_plain(dtype):
    """YBlock(fuse=True) — the stride-2 shift block routed through
    make_fused_shift_block (jnp formulation on CPU) — must match the plain
    flax composition in forward, stat updates, and every gradient."""
    clip_len, b = 4, 2
    n = b * clip_len
    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.normal(size=(n, H, H, STEM_W)), dtype or jnp.float32)

    def build(fuse):
        return YBlock(
            width=BLK_W, in_width=STEM_W, stride=2, group_size=GROUP_SIZE,
            shift="gsf", clip_len=clip_len, fuse=fuse, dtype=dtype,
        )

    plain, fused = build(False), build(True)
    variables = plain.init(jax.random.PRNGKey(2), x, False)
    # perturb BN params so stat gradients matter
    params = jax.tree.map(
        lambda a: a + 0.05 * jnp.arange(a.size, dtype=a.dtype).reshape(a.shape) / a.size,
        variables["params"],
    )
    tols = _tols(dtype)

    outs, stats, grads = {}, {}, {}
    w = jnp.asarray(rng.normal(size=(n, H // 2, H // 2, BLK_W)), jnp.float32)
    for name, mod in (("plain", plain), ("fused", fused)):
        def loss(p, x_, mod=mod):
            out, upd = mod.apply(
                {"params": p, "batch_stats": variables["batch_stats"]},
                x_, True, mutable=["batch_stats"],
            )
            return jnp.sum(out.astype(jnp.float32) * w), (out, upd)

        (l, (out, upd)), g = jax.value_and_grad(loss, argnums=(0, 1), has_aux=True)(
            params, x
        )
        outs[name], stats[name], grads[name] = out, upd["batch_stats"], g

    np.testing.assert_allclose(
        np.asarray(outs["fused"], np.float32), np.asarray(outs["plain"], np.float32),
        **tols,
    )
    flat_s = jax.tree_util.tree_flatten_with_path(stats["plain"])[0]
    flat_sf = dict(jax.tree_util.tree_flatten_with_path(stats["fused"])[0])
    for path, leaf in flat_s:
        np.testing.assert_allclose(
            np.asarray(flat_sf[path], np.float32), np.asarray(leaf, np.float32),
            err_msg=jax.tree_util.keystr(path), **tols,
        )
    gp_p, gx_p = grads["plain"]
    gp_f, gx_f = grads["fused"]
    flat_p = jax.tree_util.tree_flatten_with_path(gp_p)[0]
    flat_f = dict(jax.tree_util.tree_flatten_with_path(gp_f)[0])
    for path, leaf in flat_p:
        ref = np.asarray(leaf, np.float32)
        got = np.asarray(flat_f[path], np.float32)
        den = max(1e-3, float(np.abs(ref).max()))
        err = float(np.abs(got - ref).max()) / den
        assert err < tols["rtol"] * 5 + 1e-6, (
            f"{jax.tree_util.keystr(path)}: rel err {err:.3e}"
        )
    np.testing.assert_allclose(
        np.asarray(gx_f, np.float32), np.asarray(gx_p, np.float32), **tols
    )


@pytest.mark.parametrize("dtype", [None, jnp.bfloat16])
def test_stride1_block_fused_conv1_vs_plain(dtype):
    """Stride-1 shift YBlock with fuse=True (conv1-unit fusion, jnp path on
    CPU) vs the plain composition: forward, stat updates, gradients."""
    clip_len, b = 4, 2
    n = b * clip_len
    rng = np.random.default_rng(19)
    x = jnp.asarray(rng.normal(size=(n, H, H, BLK_W)), dtype or jnp.float32)

    def build(fuse):
        return YBlock(
            width=BLK_W, in_width=BLK_W, stride=1, group_size=GROUP_SIZE,
            shift="gsf", clip_len=clip_len, fuse=fuse, dtype=dtype,
        )

    plain, fused = build(False), build(True)
    variables = plain.init(jax.random.PRNGKey(2), x, False)
    params = jax.tree.map(
        lambda a: a + 0.05 * jnp.arange(a.size, dtype=a.dtype).reshape(a.shape) / a.size,
        variables["params"],
    )
    tols = _tols(dtype)
    w = jnp.asarray(rng.normal(size=(n, H, H, BLK_W)), jnp.float32)

    res = {}
    for name, mod in (("plain", plain), ("fused", fused)):
        def loss(p, x_, mod=mod):
            out, upd = mod.apply(
                {"params": p, "batch_stats": variables["batch_stats"]},
                x_, True, mutable=["batch_stats"],
            )
            return jnp.sum(out.astype(jnp.float32) * w), (out, upd)

        (_, (out, upd)), g = jax.value_and_grad(
            loss, argnums=(0, 1), has_aux=True
        )(params, x)
        res[name] = (out, upd["batch_stats"], g)

    np.testing.assert_allclose(
        np.asarray(res["fused"][0], np.float32),
        np.asarray(res["plain"][0], np.float32), **tols,
    )
    flat_s = jax.tree_util.tree_flatten_with_path(res["plain"][1])[0]
    flat_sf = dict(jax.tree_util.tree_flatten_with_path(res["fused"][1])[0])
    for path, leaf in flat_s:
        np.testing.assert_allclose(
            np.asarray(flat_sf[path], np.float32), np.asarray(leaf, np.float32),
            err_msg=jax.tree_util.keystr(path), **tols,
        )
    (gp_p, gx_p), (gp_f, gx_f) = res["plain"][2], res["fused"][2]
    flat_p = jax.tree_util.tree_flatten_with_path(gp_p)[0]
    flat_f = dict(jax.tree_util.tree_flatten_with_path(gp_f)[0])
    for path, leaf in flat_p:
        ref = np.asarray(leaf, np.float32)
        got = np.asarray(flat_f[path], np.float32)
        den = max(1e-3, float(np.abs(ref).max()))
        err = float(np.abs(got - ref).max()) / den
        assert err < tols["rtol"] * 5 + 1e-6, (
            f"{jax.tree_util.keystr(path)}: rel err {err:.3e}"
        )
    np.testing.assert_allclose(
        np.asarray(gx_f, np.float32), np.asarray(gx_p, np.float32), **tols
    )



def test_train_step_fused_vs_plain():
    """Full train-step integration of the fused entry path (jnp formulation
    on CPU): two AdamW steps with fuse_entry on/off from identical weights
    must agree — step-0 loss tightly (same math, reassociated), step-1 and
    the updated trees loosely (AdamW amplifies fp32 reassociation; see the
    conditioning analysis in tests/test_train_step_oracle.py)."""
    from tdeed_tpu.models.tdeed import TDEED
    from tdeed_tpu.train.schedule import make_optimizer
    from tdeed_tpu.train.state import TrainState
    from tdeed_tpu.train.step import make_train_step

    B, T, HW, NC = 2, 4, 32, 3
    rng = np.random.default_rng(5)
    frames = rng.integers(0, 256, (2, B, T, HW, HW, 3)).astype(np.uint8)
    labels = rng.integers(0, NC + 1, (2, B, T)).astype(np.int32)
    displ = rng.integers(-1, 2, (2, B, T)).astype(np.float32)

    results = {}
    for fuse in (False, True):
        model = TDEED(
            num_classes=NC, clip_len=T, feature_arch="rny002_gsf",
            n_layers=1, sgp_ks=3, sgp_r=2, radi_displacement=1,
            fuse_entry=fuse, fuse_shift=fuse, dtype=jnp.float32,
        )
        variables = jax.jit(model.init, static_argnums=2)(
            jax.random.PRNGKey(0), jnp.zeros((B, T, HW, HW, 3), jnp.float32),
            False,
        )
        tx = make_optimizer(1e-3, warmup_steps=2, cosine_steps=100)
        state = TrainState.create(
            variables["params"], variables["batch_stats"], tx
        )
        step_fn = jax.jit(
            make_train_step(
                model, tx, crop_dim=None, num_classes_bg=NC + 1, mixup=False,
                radi_displacement=1, pallas_augment=False,
            )
        )
        losses = []
        for s in range(2):
            batch = {
                "frame": jnp.asarray(frames[s]),
                "label": jnp.asarray(labels[s]),
                "labelD": jnp.asarray(displ[s]),
            }
            state, metrics = step_fn(state, batch, jax.random.PRNGKey(9))
            losses.append(float(metrics["loss"]))
        results[fuse] = (losses, state)

    (l_plain, st_plain), (l_fused, st_fused) = results[False], results[True]
    np.testing.assert_allclose(l_fused[0], l_plain[0], rtol=1e-5)
    np.testing.assert_allclose(l_fused[1], l_plain[1], rtol=1e-2)
    flat_p = jax.tree_util.tree_flatten_with_path(
        jax.tree.map(np.asarray, st_plain.params))[0]
    flat_f = dict(jax.tree_util.tree_flatten_with_path(
        jax.tree.map(np.asarray, st_fused.params))[0])
    for path, leaf in flat_p:
        np.testing.assert_allclose(
            flat_f[path], leaf, atol=5e-3, rtol=5e-2,
            err_msg=jax.tree_util.keystr(path),
        )
    flat_bs = jax.tree_util.tree_flatten_with_path(
        jax.tree.map(np.asarray, st_plain.batch_stats))[0]
    flat_bf = dict(jax.tree_util.tree_flatten_with_path(
        jax.tree.map(np.asarray, st_fused.batch_stats))[0])
    for path, leaf in flat_bs:
        np.testing.assert_allclose(
            flat_bf[path], leaf, atol=1e-3, rtol=2e-2,
            err_msg=jax.tree_util.keystr(path),
        )





