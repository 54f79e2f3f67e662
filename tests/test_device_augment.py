"""Device-side augmentation parity vs the numpy/cv2 pipeline.

Same (seed, index) rng -> the device renderer must reproduce the host
pipeline's image within interpolation tolerance (cv2 warpAffine uses 5-bit
fixed-point coords and uint8 HSV LUTs; the device path computes the same
maps in float), and the LABELS must match exactly (both paths run the same
label math in the same rng order).
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))

HYP = {"box": 0.05, "obj": 1.0, "cls": 0.5, "obj_pw": 1.0, "cls_pw": 1.0,
       "fl_gamma": 0.0, "hsv_h": 0.015, "hsv_s": 0.7, "hsv_v": 0.4,
       "rotate": 45, "translate": 0.1, "scale": 0.5, "flipud": 0.5,
       "fliplr": 0.5, "mosaic": 1.0, "mixup": 0.15}


@pytest.fixture(scope="module")
def synth(tmp_path_factory):
    from make_synth_data import main

    root = str(tmp_path_factory.mktemp("synth_devaug"))
    main(root, n_images=10, img_size=96, seed=0)
    return root


def _dataset(root, hyp=None, **kw):
    from ryolo_tpu.data.datasets import CustomDataset

    return CustomDataset(os.path.join(root, "train"), ["a", "b"],
                         hyp or HYP, img_size=96, augment=True, csl=True,
                         **kw)


def _rng(seed, index):
    return np.random.default_rng(np.random.SeedSequence([seed, 0, index]))


def _render(ds, index, seed):
    """Device-rendered image + labels for one sample."""
    import jax.numpy as jnp

    from ryolo_tpu.data.device_augment import render_specs

    path, specs, mix_r, flips, labels = ds.get_render_spec(
        index, _rng(seed, index))
    n = len(specs)
    tiles = np.stack([s["tiles"] for s in specs])
    region = np.stack([s["region"] for s in specs])
    offset = np.stack([s["offset"] for s in specs])
    hsv = np.stack([s["hsv"] for s in specs])
    minv = np.stack([s["minv"] for s in specs])
    flip = np.zeros((n, 2), bool)
    flip[0] = flips
    mix_idx = np.full((n,), -1, np.int32)
    mix_rr = np.zeros((n,), np.float32)
    if mix_r is not None:
        mix_idx[0] = 1
        mix_rr[0] = mix_r
    img = render_specs(jnp.asarray(tiles), jnp.asarray(region),
                       jnp.asarray(offset), jnp.asarray(hsv),
                       jnp.asarray(minv), jnp.asarray(flip),
                       jnp.asarray(mix_idx), jnp.asarray(mix_rr), n_out=1)
    return np.asarray(img[0]), labels, mix_r


def _assert_close_image(got, want, tag, mean_tol=3.0, frac_tol=0.03,
                        big=16.0):
    """Robust image comparison in 8-bit units: small mean error and few
    outlier pixels (fixed-point warp + HSV quantization + tile-seam taps)."""
    diff = np.abs(got.astype(np.float64) - want.astype(np.float64)) * 255.0
    mean = diff.mean()
    frac_big = (diff.max(-1) > big).mean()
    assert mean < mean_tol, f"{tag}: mean abs diff {mean:.2f}/255"
    assert frac_big < frac_tol, (
        f"{tag}: {frac_big:.1%} pixels differ by more than {big}/255")


@pytest.mark.parametrize("seed", [1, 2, 3, 4, 5, 6])
def test_render_matches_host_pipeline(synth, seed):
    ds = _dataset(synth)
    for index in range(0, 6, 2):
        path_h, img_h, labels_h = ds.get_sample(index, _rng(seed, index))
        img_d, labels_d, mix_r = _render(ds, index, seed)
        assert img_d.shape == img_h.shape
        _assert_close_image(img_d, img_h, f"seed={seed} idx={index} "
                                          f"mix={mix_r is not None}")
        # labels: identical math on identical rng draws -> exact
        assert labels_d.shape == labels_h.shape
        np.testing.assert_allclose(labels_d, labels_h, rtol=1e-5, atol=1e-5)


def test_render_letterbox_branch(synth):
    """mosaic=0 exercises the letterbox+warp single-tile path."""
    hyp = dict(HYP, mosaic=0.0, mixup=0.0)
    ds = _dataset(synth, hyp=hyp)
    for index in (0, 1):
        _, img_h, labels_h = ds.get_sample(index, _rng(9, index))
        img_d, labels_d, _ = _render(ds, index, 9)
        _assert_close_image(img_d, img_h, f"letterbox idx={index}")
        np.testing.assert_allclose(labels_d, labels_h, rtol=1e-5, atol=1e-5)


def test_identity_spec_exact(synth):
    """The host-render fallback (identity spec) must be bit-exact."""
    import jax.numpy as jnp

    from ryolo_tpu.data.device_augment import render_specs
    from ryolo_tpu.data.loader import DataLoader

    ds = _dataset(synth)
    loader = DataLoader(ds, batch_size=2, csl=True, device_augment=True,
                        max_targets=32, seed=5)
    path, spec, labels = loader._identity_spec(0)
    _, img_h, labels_h = ds.get_sample(0, loader._rng(0))
    img = render_specs(
        jnp.asarray(spec["tiles"][None]), jnp.asarray(spec["region"][None]),
        jnp.asarray(spec["offset"][None]), jnp.asarray(spec["hsv"][None]),
        jnp.asarray(spec["minv"][None]),
        jnp.zeros((1, 2), bool), jnp.full((1,), -1, jnp.int32),
        jnp.zeros((1,), jnp.float32), n_out=1)
    got = np.asarray(img[0])
    # uint8 round-trip then /255: exact to float32 rounding
    np.testing.assert_allclose(got, img_h, atol=1e-6)
    np.testing.assert_allclose(labels, labels_h, atol=1e-6)


def test_spec_loader_batches(synth):
    """Spec batches have fixed shapes; labels equal the host loader's."""
    from ryolo_tpu.data.loader import DataLoader

    ds = _dataset(synth)
    sl = DataLoader(ds, batch_size=4, csl=True, device_augment=True,
                    max_targets=32, seed=3, shuffle=False)
    hl = DataLoader(ds, batch_size=4, csl=True, max_targets=32, seed=3,
                    shuffle=False)
    sb = next(iter(sl))
    hb = next(iter(hl))
    E = sl.extra_slots
    assert sb["spec_tiles"].shape == (4 + E, 9, 96, 96)  # packed-RGB x-major
    assert sb["spec_tiles"].dtype == np.uint32
    assert sb["spec_minv"].shape == (4 + E, 2, 3)
    assert sb["spec_flip"].shape == (4, 2)
    np.testing.assert_allclose(sb["tgt"], hb["tgt"], rtol=1e-5, atol=1e-5)
    np.testing.assert_array_equal(sb["tgt_mask"], hb["tgt_mask"])
    np.testing.assert_allclose(sb["tgt_csl"], hb["tgt_csl"], rtol=1e-5,
                               atol=1e-5)


def test_banked_specs_bit_identical(synth):
    """Tile-bank specs (device_cache) must render BIT-IDENTICAL images to
    pixel specs: same gather, only the source rows differ."""
    import jax
    import jax.numpy as jnp

    from ryolo_tpu.data.device_augment import render_batch
    from ryolo_tpu.data.loader import DataLoader

    ds = _dataset(synth)
    bank = jnp.asarray(ds.build_tile_bank())
    assert bank.shape == (len(ds), 96, 96) and bank.dtype == jnp.uint32

    pl = DataLoader(ds, batch_size=4, csl=True, device_augment=True,
                    max_targets=32, seed=11, shuffle=False)
    bl = DataLoader(ds, batch_size=4, csl=True, device_augment=True,
                    device_cache=True, max_targets=32, seed=11,
                    shuffle=False)
    pb = next(iter(pl))
    bb = next(iter(bl))
    assert "spec_tile_idx" in bb and bb["spec_tile_idx"].dtype == np.int32
    assert "spec_tiles" not in bb

    def arrays(b):
        return {k: jnp.asarray(v) for k, v in b.items() if k != "paths"}

    img_p = render_batch(arrays(pb), n_out=4)
    img_b = render_batch(arrays(bb), n_out=4, bank=bank)
    np.testing.assert_array_equal(np.asarray(img_p), np.asarray(img_b))
    np.testing.assert_allclose(bb["tgt"], pb["tgt"], rtol=0, atol=0)
    np.testing.assert_array_equal(bb["tgt_mask"], pb["tgt_mask"])

    # render_batch on a banked batch without the bank must refuse
    with pytest.raises(ValueError):
        render_batch(arrays(bb), n_out=4)
    del jax


def test_banked_overflow_falls_back_to_pixels(synth):
    """When mixup draws exceed the partner slots, a banked loader must fall
    back to the (exact) pixel-spec layout for that batch."""
    import jax.numpy as jnp

    from ryolo_tpu.data.device_augment import render_batch
    from ryolo_tpu.data.loader import DataLoader

    hyp = dict(HYP, mixup=1.0)  # every sample draws a partner: B > E
    ds = _dataset(synth, hyp=hyp)
    ds.build_tile_bank()
    bl = DataLoader(ds, batch_size=4, csl=True, device_augment=True,
                    device_cache=True, max_targets=32, seed=13,
                    shuffle=False)
    pl = DataLoader(ds, batch_size=4, csl=True, device_augment=True,
                    max_targets=32, seed=13, shuffle=False)
    bb = next(iter(bl))
    assert "spec_tiles" in bb and "spec_tile_idx" not in bb  # fell back
    pb = next(iter(pl))

    def arrays(b):
        return {k: jnp.asarray(v) for k, v in b.items() if k != "paths"}

    np.testing.assert_array_equal(
        np.asarray(render_batch(arrays(bb), n_out=4)),
        np.asarray(render_batch(arrays(pb), n_out=4)),
    )
    np.testing.assert_allclose(bb["tgt"], pb["tgt"], rtol=0, atol=0)


def test_canvas_renderer_matches_taps_exactly(synth):
    """The canvas + packed-block renderer must reproduce the 4-tap
    reference renderer EXACTLY per spec (same integer tap values, same
    f32 lerp): eager per-spec comparison over mosaic4/9, letterbox and
    mixup-partner specs."""
    import jax.numpy as jnp

    import ryolo_tpu.data.device_augment as da

    ds = _dataset(synth)
    rows = np.arange(9, dtype=np.int32)
    n_specs = 0
    for seed in (1, 2, 3):
        for index in range(0, 6, 2):
            _, specs, _, _, _ = ds.get_render_spec(index, _rng(seed, index))
            for sp in specs:
                a = {k: jnp.asarray(sp[k]) for k in
                     ("tiles", "region", "offset", "hsv", "minv")}
                taps = np.asarray(da._render_one(
                    a["tiles"], jnp.asarray(rows), a["region"],
                    a["offset"], a["hsv"], a["minv"], 96))
                canv = np.asarray(da._render_one_canvas(
                    a["tiles"], jnp.asarray(rows), a["region"],
                    a["offset"], a["hsv"], a["minv"], 96))
                np.testing.assert_array_equal(taps, canv)
                n_specs += 1
    assert n_specs >= 9


def test_device_cache_requires_device_augment(synth):
    from ryolo_tpu.data.loader import DataLoader

    ds = _dataset(synth)
    with pytest.raises(ValueError):
        DataLoader(ds, batch_size=2, csl=True, device_cache=True)


def test_banked_spec_requires_bank(synth):
    ds = _dataset(synth)
    with pytest.raises(ValueError):
        ds.get_render_spec(0, _rng(1, 0), banked=True)


def test_cache_images_identical(synth):
    """cache_images must not change any sample."""
    ds0 = _dataset(synth)
    ds1 = _dataset(synth, cache_images=True)
    for index in (0, 3):
        _, img0, lab0 = ds0.get_sample(index, _rng(7, index))
        _ = ds1.get_sample(index, _rng(7, index))       # warm the cache
        _, img1, lab1 = ds1.get_sample(index, _rng(7, index))
        np.testing.assert_array_equal(img0, img1)
        np.testing.assert_array_equal(lab0, lab1)


def test_train_step_rendered_matches_two_call(synth):
    """The fused render+step program (trainer.train_step_rendered) must be
    BIT-IDENTICAL to the two-call sequence (render_batch then train_step):
    the fusion exists only to collapse the per-batch dispatch path (one
    jitted call, numpy spec args) — same traced programs, inlined."""
    import jax
    import jax.numpy as jnp
    from flax import linen as nn

    from ryolo_tpu.data.device_augment import render_batch
    from ryolo_tpu.data.loader import DataLoader
    from ryolo_tpu.train.trainer import Trainer

    ds = _dataset(synth)
    loader = DataLoader(ds, batch_size=2, csl=True, device_augment=True,
                        max_targets=8, seed=7, shuffle=False)
    b = next(iter(loader))
    sa_np = {k: np.asarray(v) for k, v in b.items() if k != "paths"}

    class Tiny(nn.Module):
        @nn.compact
        def __call__(self, x, train=False):
            x = nn.Conv(4, (3, 3), strides=(2, 2))(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9)(x)
            return x

    model = Tiny()

    def loss_fn(outputs, batch):
        # touch the targets so the fused path must thread them through
        loss = (jnp.mean(outputs.astype(jnp.float32) ** 2)
                + 1e-6 * jnp.sum(batch["tgt"] * batch["tgt_mask"][..., None]))
        return loss, {"total_loss": loss}

    sa_dev = {k: jnp.asarray(v) for k, v in sa_np.items()}
    imgs = render_batch(sa_dev, n_out=2, method="taps")
    variables = dict(model.init(jax.random.PRNGKey(0), imgs))
    tr = Trainer(model, loss_fn, "SGD", 0.1)
    state0 = tr.init_state(variables)

    arrays = {"images": imgs, "tgt": sa_dev["tgt"],
              "tgt_csl": sa_dev["tgt_csl"], "tgt_mask": sa_dev["tgt_mask"]}
    s_ref, loss_ref, _ = tr.train_step(state0, arrays, jnp.float32(0.1),
                                       jnp.int32(1))
    s_fus, loss_fus, _ = tr.train_step_rendered(
        state0, sa_np, None, jnp.float32(0.1), jnp.int32(1), 2, "taps")

    assert float(loss_ref) == float(loss_fus)
    ref_leaves = jax.tree_util.tree_leaves(s_ref.params)
    fus_leaves = jax.tree_util.tree_leaves(s_fus.params)
    for a, c in zip(ref_leaves, fus_leaves):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(c))
    for a, c in zip(jax.tree_util.tree_leaves(s_ref.batch_stats),
                    jax.tree_util.tree_leaves(s_fus.batch_stats)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(c))
