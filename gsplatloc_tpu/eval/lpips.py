"""LPIPS perceptual distance (pure JAX, AlexNet backbone).

Parity slot for the reference's torchmetrics LPIPS, instantiated at
src/data/base.py:45-48 but never exercised by the eval loop (the RGB loss
that would use it is commented out, src/my_gsplat/gs_trainer_total.py:
118-123). Implemented here so an RGB-quality evaluation can use it on TPU.

Pretrained weights cannot be downloaded in this environment; pass a params
pytree (e.g. exported from torchmetrics/lpips with `export_lpips_npz` on a
machine that has them) or use `random_lpips_params` for smoke tests. The
architecture matches lpips.LPIPS(net='alex'): 5 conv stages, unit-normalized
features, 1x1 linear calibration heads, spatial mean, stage sum.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# AlexNet feature config: (out_ch, kernel, stride, pad) per conv; features
# are tapped after each ReLU (stages relu1..relu5 of lpips 'alex').
_ALEX_CONVS = (
    (64, 11, 4, 2),
    (192, 5, 1, 2),
    (384, 3, 1, 1),
    (256, 3, 1, 1),
    (256, 3, 1, 1),
)
# max-pool (3x3 stride 2) applied BEFORE convs 2 and 3 (torchvision alexnet)
_POOL_BEFORE = (1, 2)

# lpips input scaling (imagenet-ish shift/scale on [-1, 1] inputs)
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


def random_lpips_params(seed: int = 0) -> dict:
    """He-initialized parameters with the exact pretrained-weight pytree
    structure: {'convs': [(w OIHW, b), ...], 'lins': [w (1, C, 1, 1), ...]}."""
    rng = np.random.default_rng(seed)
    convs, lins = [], []
    in_ch = 3
    for out_ch, k, _s, _p in _ALEX_CONVS:
        fan_in = in_ch * k * k
        w = rng.standard_normal((out_ch, in_ch, k, k)).astype(np.float32)
        w *= np.sqrt(2.0 / fan_in)
        convs.append((jnp.asarray(w), jnp.zeros((out_ch,), jnp.float32)))
        lins.append(jnp.asarray(
            np.abs(rng.standard_normal((1, out_ch, 1, 1))).astype(np.float32)
        ))
        in_ch = out_ch
    return {"convs": convs, "lins": lins}


def export_lpips_npz(out_path: str) -> str:
    """Export pretrained lpips(net='alex') weights to the .npz layout
    `load_lpips_params` reads (keys conv{i}_w OIHW, conv{i}_b, lin{i}_w
    (1, C, 1, 1)). Run on a machine WITH network access (downloading the
    torchvision AlexNet + lpips calibration weights); ship the .npz here.

        python -c "from gsplatloc_tpu.eval.lpips import export_lpips_npz; \\
                   export_lpips_npz('lpips_alex.npz')"
    """
    import lpips as lpips_pkg  # torch package; weights need network once

    net = lpips_pkg.LPIPS(net="alex", verbose=False)
    alex = net.net  # torchvision alexnet features wrapper (slices 1..5)
    convs = [m for m in alex.modules()
             if m.__class__.__name__ == "Conv2d"]
    lins = [lin.model[-1] for lin in net.lins]  # Dropout? -> final 1x1 conv
    out = {}
    for i, conv in enumerate(convs):
        out[f"conv{i}_w"] = conv.weight.detach().cpu().numpy()
        out[f"conv{i}_b"] = conv.bias.detach().cpu().numpy()
    for i, lin in enumerate(lins):
        out[f"lin{i}_w"] = lin.weight.detach().cpu().numpy()
    np.savez(out_path, **out)
    return out_path


def load_lpips_params(path: str) -> dict:
    """Load params from an .npz with keys conv{i}_w, conv{i}_b, lin{i}_w."""
    z = np.load(path)
    convs = [
        (jnp.asarray(z[f"conv{i}_w"]), jnp.asarray(z[f"conv{i}_b"]))
        for i in range(len(_ALEX_CONVS))
    ]
    lins = [jnp.asarray(z[f"lin{i}_w"]) for i in range(len(_ALEX_CONVS))]
    return {"convs": convs, "lins": lins}


def _features(x: jnp.ndarray, params: dict) -> list[jnp.ndarray]:
    """x: (N, 3, H, W) in [-1, 1] -> list of 5 feature maps (N, C, h, w)."""
    x = (x - jnp.asarray(_SHIFT)[None, :, None, None]) / jnp.asarray(
        _SCALE
    )[None, :, None, None]
    feats = []
    for i, ((w, b), (_c, _k, s, p)) in enumerate(
        zip(params["convs"], _ALEX_CONVS)
    ):
        if i in _POOL_BEFORE:
            x = jax.lax.reduce_window(
                x, -jnp.inf, jax.lax.max, (1, 1, 3, 3), (1, 1, 2, 2), "VALID"
            )
        x = jax.lax.conv_general_dilated(
            x, w, window_strides=(s, s), padding=[(p, p), (p, p)],
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
        ) + b[None, :, None, None]
        x = jax.nn.relu(x)
        feats.append(x)
    return feats


def lpips(
    img_a: jnp.ndarray,  # (H, W, 3) or (N, H, W, 3), values in [0, 1]
    img_b: jnp.ndarray,
    params: dict,
) -> jnp.ndarray:
    """LPIPS(a, b): unit-normalize each stage's features channel-wise, take
    the calibrated (1x1 conv) squared difference, mean over space, sum over
    stages. Returns scalar (or (N,) for batched input)."""
    if img_a.ndim == 3:
        img_a, img_b = img_a[None], img_b[None]
        squeeze = True
    else:
        squeeze = False
    xa = jnp.transpose(img_a, (0, 3, 1, 2)) * 2.0 - 1.0
    xb = jnp.transpose(img_b, (0, 3, 1, 2)) * 2.0 - 1.0
    total = 0.0
    for fa, fb, lin in zip(
        _features(xa, params), _features(xb, params), params["lins"]
    ):
        na = fa * jax.lax.rsqrt(jnp.sum(fa * fa, 1, keepdims=True) + 1e-10)
        nb = fb * jax.lax.rsqrt(jnp.sum(fb * fb, 1, keepdims=True) + 1e-10)
        d = (na - nb) ** 2
        total = total + jnp.mean(jnp.sum(d * lin, axis=1), axis=(1, 2))
    return total[0] if squeeze else total
